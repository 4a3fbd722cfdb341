package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

/**
 * Sink surface (SURVEY.md §2.9) + the side-output pattern: the reference
 * fans alarm/late/unmatched rows out of one operator via Flink OutputTags
 * (e.g. TxPayMatch.java:28-29); Spark has no side outputs, so detectors
 * emit a tagged union and this splitter writes each tag to its own sink
 * from a single `foreachBatch` — one pass over the micro-batch, N sinks.
 */
object Sinks {

  /** Streaming tagged-union splitter: route each `tagCol` value to its own
    * writer inside foreachBatch. Unlisted tags are dropped (or routed to
    * `otherwise` when given). The batch is cached once per trigger so N
    * routes do not recompute the plan N times. */
  def splitByTag(stream: DataFrame, tagCol: String,
                 routes: Map[String, DataFrame => Unit],
                 otherwise: Option[DataFrame => Unit] = None): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      batch.persist()
      try {
        routes.foreach { case (tag, write) =>
          write(batch.filter(col(tagCol) === tag))
        }
        otherwise.foreach { write =>
          write(batch.filter(!col(tagCol).isin(routes.keys.toSeq: _*)))
        }
      } finally { batch.unpersist(); () }
    }

  /** K1 console sink (reference `.print(label)`). */
  def console(stream: DataFrame, label: String): StreamingQuery =
    stream.withColumn("label", lit(label))
      .writeStream.format("console").outputMode("append").start()

  /** Parquet append sink with checkpointing — the durable replacement for
    * the reference's Redis externalization (K2): results land columnar and
    * re-queryable instead of in a KV side-store. */
  def parquet(stream: DataFrame, path: String, checkpoint: String): StreamingQuery =
    stream.writeStream.format("parquet")
      .option("path", path).option("checkpointLocation", checkpoint)
      .outputMode("append").start()

  /** The writer options a Kafka sink needs (mirror of
    * `EventSources.kafkaOptions` on the producer side — broker config is
    * deploy-time, asserted by contract spec without a broker). */
  def kafkaSinkOptions(brokers: String, topic: String,
                       options: Map[String, String] = Map.empty): Map[String, String] =
    Map("kafka.bootstrap.servers" -> brokers, "topic" -> topic) ++ options

  /** Kafka wire projection for the producer side: the sink requires a
    * `value` column (STRING or BINARY) and optionally `key`. */
  def kafkaWireProjection(keyExpr: String, valueExpr: String): Seq[String] =
    Seq(s"CAST(($keyExpr) AS STRING) AS key", s"CAST(($valueExpr) AS STRING) AS value")

  /** Kafka producer sink: project to the wire schema and write the topic.
    * Requires a running broker — the option/projection contract is what
    * the sandbox spec covers. */
  def kafka(stream: DataFrame, brokers: String, topic: String,
            keyExpr: String, valueExpr: String, checkpoint: String,
            options: Map[String, String] = Map.empty): StreamingQuery = {
    val base = stream.selectExpr(kafkaWireProjection(keyExpr, valueExpr): _*)
      .writeStream.format("kafka")
    kafkaSinkOptions(brokers, topic, options)
      .foldLeft(base) { case (w, (k, v)) => w.option(k, v) }
      .option("checkpointLocation", checkpoint)
      .outputMode("append").start()
  }
}
