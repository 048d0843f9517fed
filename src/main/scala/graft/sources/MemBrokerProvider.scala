package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Spark DataSource V2 streaming connector over [[MemoryBroker]] — the
  * in-JVM stand-in for `format("kafka")`, emitting and accepting the
  * exact [[KafkaSource.kafkaRecordSchema]] so the encode/decode
  * transforms are IDENTICAL between this harness and a production
  * broker. Options: `broker` (registry name), `topic`, `partitions`
  * (topic creation, default 4).
  *
  * Read side is a real [[MicroBatchStream]]: offsets are per-partition
  * end positions (JSON array), each micro-batch plans one
  * [[InputPartition]] per broker partition covering the (start, end]
  * offset range — the same planning shape as the Kafka connector, which
  * is what makes the spec's offset/recovery behavior meaningful.
  * Write side is a streaming [[DataWriter]] appending to the broker
  * log; appends are at-least-once under task retries (exactly-once
  * requires a transactional broker — same contract as the Kafka sink).
  */
class MemBrokerProvider extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaSource.kafkaRecordSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val broker = properties.getOrDefault("broker", "default")
    val topic = properties.getOrDefault("topic", "graft-events")
    val parts = properties.getOrDefault("partitions", "4").toInt
    MemoryBroker.createTopic(broker, topic, parts)
    new MemBrokerTable(broker, topic)
  }
}

private[sources] class MemBrokerTable(broker: String, topic: String)
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"membroker:$broker/$topic"
  override def schema(): StructType = KafkaSource.kafkaRecordSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = KafkaSource.kafkaRecordSchema
        override def toMicroBatchStream(checkpointLocation: String)
            : MicroBatchStream = new MemBrokerMicroBatchStream(broker, topic)
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val schema = info.schema()
    def idx(name: String): Int = schema.fieldNames.indexOf(name)
    val (ki, vi, ti) = (idx("key"), idx("value"), idx("timestamp"))
    require(ki >= 0 && vi >= 0,
      s"membroker sink needs key/value binary columns, got ${schema.sql}")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite =
          new MemBrokerStreamingWrite(broker, topic, ki, vi, ti)
      }
    }
  }
}

/** Per-partition end offsets as the stream position. */
private[sources] case class BrokerOffsets(ends: Seq[Long]) extends Offset {
  override def json(): String = ends.mkString("[", ",", "]")
}

private[sources] object BrokerOffsets {
  def parse(json: String): BrokerOffsets = {
    val body = json.trim.stripPrefix("[").stripSuffix("]").trim
    BrokerOffsets(
      if (body.isEmpty) Seq.empty else body.split(",").toSeq.map(_.trim.toLong))
  }
}

private[sources] class MemBrokerMicroBatchStream(broker: String, topic: String)
    extends MicroBatchStream {

  private def numPartitions: Int =
    MemoryBroker.getTopic(broker, topic).numPartitions

  override def initialOffset(): Offset =
    BrokerOffsets(Seq.fill(numPartitions)(0L))

  override def latestOffset(): Offset =
    BrokerOffsets(MemoryBroker.endOffsets(broker, topic).toSeq)

  override def deserializeOffset(json: String): Offset =
    BrokerOffsets.parse(json)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[BrokerOffsets].ends
    val e = end.asInstanceOf[BrokerOffsets].ends
    (0 until numPartitions).flatMap { p =>
      val (from, until) = (if (p < s.size) s(p) else 0L,
        if (p < e.size) e(p) else 0L)
      if (until > from) Some(BrokerRange(broker, topic, p, from, until))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    MemBrokerReaderFactory()
}

/** Standalone serializable factory — ships to tasks. */
private[sources] case class MemBrokerReaderFactory()
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] =
    new MemBrokerPartitionReader(partition.asInstanceOf[BrokerRange])
}

private[sources] case class BrokerRange(broker: String, topic: String,
    partition: Int, from: Long, until: Long) extends InputPartition

private[sources] class MemBrokerPartitionReader(r: BrokerRange)
    extends PartitionReader[InternalRow] {
  // local[*] harness: the "executor" shares the driver JVM, so the
  // registry fetch here is the same log the writer appended to
  private val records = MemoryBroker.fetch(r.broker, r.topic, r.partition,
    r.from, r.until)
  private var i = -1

  override def next(): Boolean = { i += 1; i < records.size }

  override def get(): InternalRow = {
    val (offset, rec) = records(i)
    new GenericInternalRow(Array[Any](
      rec.key, rec.value, UTF8String.fromString(r.topic),
      r.partition, offset, rec.tsMicros, 0))
  }

  override def close(): Unit = ()
}

private[sources] class MemBrokerStreamingWrite(broker: String, topic: String,
    keyIdx: Int, valIdx: Int, tsIdx: Int) extends StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    // the factory ships to tasks — a standalone serializable case class,
    // never an inner class capturing this (non-serializable) write
    MemBrokerWriterFactory(broker, topic, keyIdx, valIdx, tsIdx)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] case class MemBrokerWriterFactory(broker: String,
    topic: String, keyIdx: Int, valIdx: Int, tsIdx: Int)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      override def write(row: InternalRow): Unit = {
        val key = if (row.isNullAt(keyIdx)) null else row.getBinary(keyIdx)
        val value = if (row.isNullAt(valIdx)) null else row.getBinary(valIdx)
        val ts = if (tsIdx >= 0 && !row.isNullAt(tsIdx)) row.getLong(tsIdx)
          else 0L
        MemoryBroker.append(broker, topic, key, value, ts)
      }
      override def commit(): WriterCommitMessage =
        MemBrokerCommit(partitionId)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

private[sources] case class MemBrokerCommit(partitionId: Int)
    extends WriterCommitMessage
