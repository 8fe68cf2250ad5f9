package graft.crypto

import graft.Q

/** Parquet Modular Encryption parity surface (SURVEY.md Part A / Q24) —
  * encrypted write + privilege-gated read roundtrip. Filled in with the
  * KMS client/server implementation.
  */
object CryptoParity {
  val queries: Seq[Q] = Seq.empty
}
