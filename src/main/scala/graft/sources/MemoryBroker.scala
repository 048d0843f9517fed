package graft.sources

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

/** A minimal in-JVM message broker with Kafka's log semantics — named
  * topics, fixed partition counts, key-sticky partitioning, per-partition
  * append-only logs with monotonically increasing offsets, and fetch by
  * offset range. It exists so the [[KafkaSource]] wire path (encode →
  * topic → decode) can be exercised END TO END through a real
  * offset-tracked source/sink pair in a sandbox with no broker and no
  * kafka connector jar ([[MemBrokerProvider]] is the Spark DataSource V2
  * connector over it; the reference's actual wire is a managed bus,
  * `analysis-dataflow-pipeline/pipeline.py:77`).
  *
  * Scope: LOCAL-MODE TEST HARNESS. State lives in a JVM-static registry,
  * which is correct exactly when driver and executors share one JVM
  * (`local[*]`) — the cluster deployment swaps `format(classOf
  * [MemBrokerProvider].getName)` for `format("kafka")` and keeps every
  * transform. Partitioning is deterministic murmur3-over-key-bytes (a
  * stand-in for Kafka's murmur2 — key-sticky, so per-key ordering holds
  * per partition, which is what the windowed aggregation's watermark
  * relies on; the constant differs from a real broker's placement).
  */
object MemoryBroker {

  final case class Record(key: Array[Byte], value: Array[Byte], tsMicros: Long)

  final class Topic(val numPartitions: Int) {
    val parts: Array[ArrayBuffer[Record]] =
      Array.fill(numPartitions)(ArrayBuffer.empty[Record])
  }

  private val brokers =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, Topic]]()

  private def topics(broker: String): ConcurrentHashMap[String, Topic] =
    brokers.computeIfAbsent(broker, _ => new ConcurrentHashMap[String, Topic]())

  /** Create-if-absent; an existing topic keeps its partition count. */
  def createTopic(broker: String, topic: String, partitions: Int): Topic =
    topics(broker).computeIfAbsent(topic, _ => new Topic(partitions))

  def getTopic(broker: String, topic: String): Topic = {
    val t = topics(broker).get(topic)
    require(t != null, s"membroker: unknown topic '$topic' on broker '$broker'")
    t
  }

  /** Key-sticky partition assignment (null keys land in partition 0). */
  def partitionFor(key: Array[Byte], numPartitions: Int): Int =
    if (key == null || key.isEmpty) 0
    else (scala.util.hashing.MurmurHash3.bytesHash(key, 42) & Int.MaxValue) %
      numPartitions

  /** Append one record; returns (partition, offset). */
  def append(broker: String, topic: String, key: Array[Byte],
      value: Array[Byte], tsMicros: Long): (Int, Long) = {
    val t = getTopic(broker, topic)
    val p = partitionFor(key, t.numPartitions)
    val buf = t.parts(p)
    buf.synchronized {
      buf += Record(key, value, tsMicros)
      (p, (buf.size - 1).toLong)
    }
  }

  /** Records of partition `p` with offsets in [from, until). */
  def fetch(broker: String, topic: String, p: Int, from: Long,
      until: Long): IndexedSeq[(Long, Record)] = {
    val buf = getTopic(broker, topic).parts(p)
    buf.synchronized {
      val hi = math.min(until, buf.size.toLong)
      (from until hi).map(o => o -> buf(o.toInt))
    }
  }

  /** Current end offset (next offset to be written) per partition. */
  def endOffsets(broker: String, topic: String): Array[Long] = {
    val t = getTopic(broker, topic)
    t.parts.map(buf => buf.synchronized(buf.size.toLong))
  }

  /** Drop all state for a broker (test isolation). */
  def clear(broker: String): Unit = brokers.remove(broker)
}
