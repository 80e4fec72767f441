package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Java-serializable carrier for a Hadoop [[Configuration]], so the
  * driver's session conf (spark.hadoop.* overrides — s3a credentials,
  * endpoints, timeouts) reaches executor-side readers and writers
  * instead of being silently replaced by `new Configuration()`
  * defaults. Spark ships the same shape internally
  * (`org.apache.spark.util.SerializableConfiguration`) but keeps it
  * `private[spark]`, so we carry our own.
  *
  * `Configuration` itself implements Hadoop `Writable`, which is what
  * the custom read/write hooks delegate to. */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
