package graft.sinks

import java.nio.charset.StandardCharsets.UTF_8
import java.util.EnumSet

import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path => HPath}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K1 record sink — the batched executor-side emitter the reference's
  * Kafka REST bridge client implies at scale.
  *
  * The reference POSTs ONE record per HTTP request
  * (/root/reference/src/api/kafka_producer.py:20-45: payload
  * `{"records":[{"key": job_id, "value": message}]}` to
  * `/topics/<topic>`) — fine for a single browser process, fatal for a
  * 1000-executor job (one round-trip per row). Here each PARTITION batches
  * its rows and emits one bridge payload per `batchSize` rows via
  * foreachPartition: the client "connection" is opened once per partition
  * (the partition-local init of SURVEY R3), rows stream through a bounded
  * buffer (no partition-sized materialization), and every batch is one
  * atomic emission.
  *
  * The transport is a topic DIRECTORY standing in for the bridge URL (this
  * sandbox has no Kafka; the payload bytes are exactly what the POST body
  * would be, so swapping the file write for an HTTP call is the only
  * deployment delta). Each batch lands as `batch-p<partition>-<n>.json`
  * via write-tmp-then-rename, so a killed task retry overwrites its own
  * batches idempotently (task attempt outputs are keyed by partition id,
  * not attempt id) and readers never observe a torn file.
  */
object RecordSink {

  /** Emit `df` to `topicDir`, one JSON bridge payload per ≤`batchSize`
    * rows per partition. `keyCol` becomes each record's key (the
    * reference keys on job_id); the full row becomes the value. `tag`
    * namespaces this emission's batch files — callers emitting the same
    * topic repeatedly (one call per epoch) pass a distinct tag per call,
    * or later emissions overwrite earlier ones' batch names; a RETRY of
    * the same (tag, partition) overwriting itself is exactly the
    * idempotence we want.
    */
  def emit(df: DataFrame, keyCol: String, topicDir: String,
      tag: String = "0", batchSize: Int = 500): Unit = {
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val kv = df.select(
      col(keyCol).cast("string").as("_key"),
      to_json(struct(df.columns.map(col): _*)).as("_value"))
    kv.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val pid = TaskContext.getPartitionId()
      val dir = new HPath(topicDir)
      val fc = FileContext.getFileContext(dir.toUri, hadoopConf.value)
      fc.mkdir(dir, FsPermission.getDirDefault, true)
      var batchNo = 0
      val buf = new StringBuilder
      var inBuf = 0
      def flush(): Unit = if (inBuf > 0) {
        val body = s"""{"records":[${buf.result()}]}"""
        val target = new HPath(dir, s"batch-$tag-p$pid-$batchNo.json")
        val tmp = new HPath(dir, s".batch-$tag-p$pid-$batchNo.json.tmp")
        val out = fc.create(tmp, EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE))
        try out.write(body.getBytes(UTF_8)) finally out.close()
        fc.rename(tmp, target, Options.Rename.OVERWRITE)
        batchNo += 1; buf.clear(); inBuf = 0
      }
      rows.foreach { r =>
        if (inBuf > 0) buf.append(',')
        // value is already a JSON object string; key mirrors the bridge's
        // string key field (nullable — a null key partitions round-robin
        // on a real bridge, so emit JSON null rather than NPE)
        val key = if (r.isNullAt(0)) "null" else jsonString(r.getString(0))
        buf.append("{\"key\":").append(key)
          .append(",\"value\":").append(r.getString(1)).append('}')
        inBuf += 1
        if (inBuf >= batchSize) flush()
      }
      flush()
    }
  }

  private def jsonString(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Read a topic directory back as (key, value-json) rows — the test-side
    * consumer. Batch files each hold one bridge payload.
    */
  def readTopic(spark: org.apache.spark.sql.SparkSession,
      topicDir: String): DataFrame = {
    spark.read.json(s"$topicDir/batch-*.json")
      .select(explode(col("records")).as("r"))
      .select(col("r.key").as("key"), to_json(col("r.value")).as("value"))
  }
}
