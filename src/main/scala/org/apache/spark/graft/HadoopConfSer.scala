package org.apache.spark.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.util.SerializableConfiguration

/** Opaque serializable handle for a Hadoop Configuration, so executor
  * tasks can carry the DRIVER's filesystem/crypto settings (s3a
  * credentials, KMS endpoints, custom FS impls) instead of rebuilding a
  * default conf that only works on `file://`. Spark's own wrapper
  * (`org.apache.spark.util.SerializableConfiguration`) does exactly
  * this for every file-source task; it is package-guarded in some Spark
  * lines, hence this bridge in the `org.apache.spark` namespace (the
  * same seam as [[ListenerFlush]]). The handle type is plain
  * `Serializable` so caller code never names the guarded class.
  */
object HadoopConfSer {
  def wrap(conf: Configuration): java.io.Serializable =
    new SerializableConfiguration(conf)
  def unwrap(h: java.io.Serializable): Configuration =
    h.asInstanceOf[SerializableConfiguration].value
}
