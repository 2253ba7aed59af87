package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2: deterministic synthetic tick generator — the
  * market-data analog of Spark's `rate` source, for benchmarks and
  * load tests with zero input IO.
  *
  * `spark.read.format("tickgen").option("rows", 2000000).load()`
  *
  * Options: `rows` (total ticks), `partitions` (parallel splits,
  * default 32), `startEpoch` (first tick second, default 1700000000),
  * `symbols` (symbol universe size, default 5 — the default keeps the
  * 5 named tickers the oracle SQL mirrors; larger universes emit
  * uniform synthetic names for many-symbol scale tests, where
  * per-symbol windows must spread over all cores instead of maxing
  * out at 5-way parallelism). Tick `id` maps to columns via fixed
  * arithmetic (symbol round-robin, 5 ticks/second, 2-dp prices from a
  * prime-stride sequence), so any slice of the stream is reproducible
  * anywhere — including inside a SQL oracle.
  *
  * Spark-native surface demonstrated: `TableProvider` → `ScanBuilder`
  * with column pruning (`SupportsPushDownRequiredColumns` — a
  * projection of 2 columns materializes only those 2), split into
  * `InputPartition` ranges read by per-task `PartitionReader`s.
  */
class TickGenSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tickgen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TickGenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TickGenTable()
}

object TickGenSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("price", DoubleType, nullable = false),
    StructField("volume", LongType, nullable = false)))

  val symbols: Array[UTF8String] =
    Array("AAPL", "MSFT", "GOOG", "AMZN", "TSLA").map(UTF8String.fromString)

  /** Symbol universe of size `n`: the 5 named tickers for the default
    * universe, else uniform synthetic names. Cached per size and built
    * lazily inside each executor JVM — the reader factory ships only
    * the integer.
    */
  private val symbolCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[UTF8String]]()
  def symbolsFor(n: Int): Array[UTF8String] =
    if (n == 5) symbols
    else symbolCache.computeIfAbsent(n, m =>
      Array.tabulate(m)(k => UTF8String.fromString(f"S$k%05d")))

  /** id → column value, shared by every reader (and mirrored by the
    * DuckDB oracle SQL in SparkEntry).
    */
  @inline def priceOf(id: Long): Double = 100.0 + (id * 7919L % 10000L) / 100.0
  @inline def volumeOf(id: Long): Long = id * 104729L % 9900L + 100L
  @inline def tsMicrosOf(id: Long, startEpoch: Long): Long =
    (startEpoch + id / 5L) * 1000000L
}

private class TickGenTable extends Table with SupportsRead {
  override def name(): String = "tickgen"
  override def schema(): StructType = TickGenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TickGenScanBuilder(
      options.getLong("rows", 1000000L),
      options.getInt("partitions", 32),
      options.getLong("startEpoch", 1700000000L),
      options.getInt("symbols", 5))
}

private class TickGenScanBuilder(rows: Long, partitions: Int, startEpoch: Long,
    nSymbols: Int) extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = TickGenSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new TickGenScan(rows, partitions, startEpoch, nSymbols, required)
}

private class TickGenScan(rows: Long, partitions: Int, startEpoch: Long,
    nSymbols: Int, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0L until rows by per)
      .map(start => TickGenPartition(start, math.min(start + per, rows)))
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TickGenReaderFactory(startEpoch, nSymbols, required.fieldNames)
}

private case class TickGenPartition(start: Long, end: Long) extends InputPartition

private class TickGenReaderFactory(startEpoch: Long, nSymbols: Int,
    fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TickGenPartition]
    val syms = TickGenSource.symbolsFor(nSymbols)
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow = {
        val row = new GenericInternalRow(fields.length)
        var i = 0
        while (i < fields.length) {
          fields(i) match {
            case "id" => row.update(i, id)
            case "symbol" => row.update(i, syms((id % nSymbols).toInt))
            case "ts" => row.update(i, TickGenSource.tsMicrosOf(id, startEpoch))
            case "price" => row.update(i, TickGenSource.priceOf(id))
            case "volume" => row.update(i, TickGenSource.volumeOf(id))
          }
          i += 1
        }
        row
      }
      override def close(): Unit = ()
    }
  }
}
