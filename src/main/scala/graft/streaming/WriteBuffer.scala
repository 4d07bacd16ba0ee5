package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-buffer abstraction — the reference's pluggable ingest buffer
  * (server/src/write_buffer.rs:57-73 `WriteBufferWriting` /
  * `WriteBufferReading`; selected per database by
  * `WriteBufferConnection` in the rules, database_rules.rs:58-66, via the
  * `WriteBufferConfig::new` factory, write_buffer.rs:27-52).
  *
  * The engine's ingest path is written against these traits only: any
  * `Reading` yields a streaming DataFrame of sequenced entries that flows
  * into `Ingest.parseStream` -> `Ingest.startPersist`, so which buffer
  * backs a database is a connection-string decision, not a code change —
  * the claim the reference makes for its Kafka buffer, proven here by
  * running the SAME pipeline over the file and in-memory implementations
  * (`WriteBufferSpec`).
  *
  * Implementations:
  *  - `file:<dir>` — durable sequenced files (`entry-%016d.lp`, written
  *    tmp+atomic-rename so readers never see partial entries). Replay =
  *    re-list; combined with Structured Streaming checkpoints this gives
  *    the exactly-once restart semantics the reference gets from Kafka
  *    offsets (`Sequence.number` IS the file index, like the Kafka
  *    offset; one sequencer, id 0).
  *  - `mem:<name>` — process-local, the reference's
  *    `MockBufferForWriting` twin (write_buffer.rs:220-260) for tests
  *    and ephemeral databases.
  *  - `kafka:<brokers>` — the reference's production buffer
  *    (KafkaBufferProducer/Consumer, write_buffer.rs:75-210). The swap
  *    point exists here at config level, but this build cannot ship it:
  *    the sandbox has no spark-sql-kafka connector jar and zero egress
  *    (disclosed, SURVEY §8.1). The arm throws with the exact reason
  *    rather than silently falling back.
  */
object WriteBuffer {

  /** Where an entry landed (entry/src/entry.rs `Sequence`): which
    * sequencer (Kafka partition / file dir / memory queue) and its
    * monotone number within it. */
  final case class Sequence(sequencerId: Int, number: Long)

  /** Entry sink: durably append, get the sequence back. */
  trait Writing {
    def storeEntry(lines: String): Sequence
  }

  /** Entry source: continuous stream of sequenced entries as a streaming
    * DataFrame (sequencer_id int, sequence_number long, line string) —
    * the `SequencedEntry` stream a database ingests from. */
  trait Reading {
    def stream(spark: SparkSession): DataFrame
  }

  /** Config-level factory (WriteBufferConfig::new): connection string ->
    * implementation. Writing and reading ends of a `file:` buffer are
    * independent instances over the same directory, like a Kafka
    * producer/consumer pair on one topic; `mem:` names share a
    * process-local registry so both ends meet. */
  def writing(conn: String): Writing = impl(conn)

  def reading(conn: String): Reading = impl(conn)

  private def impl(conn: String): Writing with Reading = conn match {
    case c if c.startsWith("file:") => new FileBuffer(c.stripPrefix("file:"))
    case c if c.startsWith("mem:") =>
      memRegistry.getOrElseUpdate(c.stripPrefix("mem:"), new MemBuffer)
    case c if c.startsWith("kafka:") => throw new UnsupportedOperationException(
      "kafka write buffer: no spark-sql-kafka connector jar in this " +
        "zero-egress build (would be spark.readStream.format(\"kafka\") " +
        "behind the same Reading trait); use file: or mem:")
    case other => throw new IllegalArgumentException(
      s"unknown write buffer connection: $other")
  }

  // ------------------------------------------------------ file sequencer

  /** Durable single-sequencer buffer over a directory of sequenced entry
    * files. The counter seeds past existing entries, so reopening a
    * buffer continues its sequence. Cross-process writers need one owner
    * per directory, like one Kafka producer per partition. */
  final class FileBuffer(dir: String) extends Writing with Reading {
    private val root: Path = Paths.get(dir)
    Files.createDirectories(root)
    private val next = {
      val existing = listEntries()
      new AtomicLong(if (existing.isEmpty) 0L else existing.max + 1L)
    }

    override def storeEntry(lines: String): Sequence = {
      val n = next.getAndIncrement()
      val tmp = root.resolve(f".entry-$n%016d.tmp")
      Files.write(tmp, lines.getBytes(UTF_8))
      Files.move(tmp, root.resolve(f"entry-$n%016d.lp"),
        StandardCopyOption.ATOMIC_MOVE)
      Sequence(0, n)
    }

    override def stream(spark: SparkSession): DataFrame =
      spark.readStream.format("text")
        .option("pathGlobFilter", "entry-*.lp")
        .load(root.toString)
        .select(lit(0).as("sequencer_id"),
          regexp_extract(col("_metadata.file_path"), "entry-(\\d+)\\.lp$", 1)
            .cast("long").as("sequence_number"),
          col("value").as("line"))

    private def listEntries(): Seq[Long] = {
      val re = "entry-(\\d+)\\.lp".r
      val s = Files.list(root)
      try s.iterator().asScala.toSeq.flatMap(p => p.getFileName.toString match {
        case re(n) => Some(n.toLong)
        case _ => None
      }) finally s.close()
    }
  }

  private val memRegistry = TrieMap.empty[String, MemBuffer]

  // -------------------------------------------------- in-memory sequencer

  /** Process-local buffer: stores land in a MemoryStream once a reader
    * attaches (pre-attach entries are buffered and flushed on attach). */
  final class MemBuffer extends Writing with Reading {
    private val seq = new AtomicLong
    private var pending = Vector.empty[(Long, String)]
    private var sink: Option[
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]] = None

    override def storeEntry(lines: String): Sequence = synchronized {
      val n = seq.getAndIncrement()
      sink match {
        case Some(ms) => ms.addData((n, lines))
        case None => pending :+= ((n, lines))
      }
      Sequence(0, n)
    }

    override def stream(spark: SparkSession): DataFrame = synchronized {
      import spark.implicits._
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)](spark)
      if (pending.nonEmpty) { ms.addData(pending); pending = Vector.empty }
      sink = Some(ms)
      ms.toDF().select(lit(0).as("sequencer_id"),
        col("_1").as("sequence_number"), col("_2").as("line"))
    }
  }
}
