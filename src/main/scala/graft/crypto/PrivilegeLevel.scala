package graft.crypto

/** The reference's totally ordered privilege lattice:
  * plaintext < PUBLIC < INTERNAL < CONFIDENTIAL < RESTRICTED
  * (reference README.md:93-94; enforced server-side at kms_server.py:104-127).
  *
  * Semantics reproduced exactly (FIXTURES.md §2 truth table):
  *  - unwrapping the PUBLIC KEK never checks the token;
  *  - unwrapping any other KEK requires a token whose level is >= the KEK
  *    level, and the PUBLIC token is never accepted for non-public KEKs
  *    (kms_server.py:106-123 — PUBLIC is not in any allowed set).
  */
sealed abstract class PrivilegeLevel(val name: String, val rank: Int)
    extends Ordered[PrivilegeLevel] {
  override def compare(that: PrivilegeLevel): Int = rank - that.rank
  override def toString: String = name
}

object PrivilegeLevel {
  case object Public       extends PrivilegeLevel("PUBLIC", 0)
  case object Internal     extends PrivilegeLevel("INTERNAL", 1)
  case object Confidential extends PrivilegeLevel("CONFIDENTIAL", 2)
  case object Restricted   extends PrivilegeLevel("RESTRICTED", 3)

  val all: Seq[PrivilegeLevel] = Seq(Public, Internal, Confidential, Restricted)

  def fromName(s: String): Option[PrivilegeLevel] = all.find(_.name == s)

  /** Server-side authorization decision for `unwrap` (kms_server.py:104-127).
    * @param kek   KEK privilege level named in the URL path
    * @param token privilege token from the x-api-key header, None if absent
    * @return true iff the unwrap is allowed (else the server answers 403)
    */
  def mayUnwrap(kek: PrivilegeLevel, token: Option[PrivilegeLevel]): Boolean =
    kek match {
      case Public => true
      case _      => token.exists(t => t != Public && t >= kek)
    }
}
