package graft.sources

/** Hadoop `Configuration` is not `Serializable`, but task-side
  * filesystem access must still see the SESSION's configuration —
  * `spark.hadoop.*` credentials, object-store endpoints, custom FS
  * implementations — rather than a blank `new Configuration()`, which
  * only ever resolves `file://` (an r15 review finding: the bloom
  * side-file writes and the distributed probe's shard loads worked on
  * the local FS alone). Serializes the conf through Hadoop's own
  * Writable protocol, the same scheme Spark's (private)
  * `SerializableConfiguration` uses. */
final class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}
