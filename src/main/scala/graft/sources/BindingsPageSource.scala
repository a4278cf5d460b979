package graft.sources

import java.util
import graft.harvest.Schemas
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 connector for the paginated bindings source (SURVEY §4.2):
  * the reference fetches `LIMIT pageSize OFFSET k` pages sequentially
  * (/root/reference/harvest.py:54-87,405-416); this connector plans ONE
  * INPUT PARTITION PER PAGE (`planInputPartitions`), so a cluster fetches
  * all pages concurrently and Catalyst sees an ordinary relation.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft-bindings")
  *     .option("totalCount", 2500).option("pageSize", 1000).load()
  * }}}
  *
  * The page PAYLOAD here is produced by a deterministic synthetic generator
  * standing in for the remote endpoint (this container has no egress); a
  * live deployment replaces [[BindingsPartitionReader.fetchPage]] with the
  * HTTP call wrapped in [[graft.harvest.Source.withRetry]].
  */
class BindingsPageSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-bindings"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Schemas.bindings
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new BindingsTable(properties.asScala.toMap)
}

class BindingsTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "graft_bindings"
  override def schema(): StructType = Schemas.bindings
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BindingsScanBuilder(
      options.getLong("totalCount", props.getOrElse("totalcount", "1000").toLong),
      options.getInt("pageSize", props.getOrElse("pagesize", "1000").toInt))
}

class BindingsScanBuilder(totalCount: Long, pageSize: Int) extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = Schemas.bindings
  override def toBatch: Batch = this

  /** A1 as partition planning: ceil(totalCount / pageSize) offset-range
    * partitions — the reference's sequential page loop, parallelized. */
  override def planInputPartitions(): Array[InputPartition] =
    (0L until totalCount by pageSize.toLong)
      .map(off => BindingsPage(off,
        math.min(pageSize.toLong, totalCount - off).toInt): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory = BindingsReaderFactory
}

case class BindingsPage(offset: Long, limit: Int) extends InputPartition

object BindingsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new BindingsPartitionReader(partition.asInstanceOf[BindingsPage])
}

class BindingsPartitionReader(page: BindingsPage) extends PartitionReader[InternalRow] {
  private var i = -1

  /** Deterministic page payload (stands in for the remote endpoint; see
    * class doc). One row per concept index with OPTIONAL-style nulls. */
  def fetchPage(idx: Long): InternalRow = {
    def s(v: String) = UTF8String.fromString(v)
    InternalRow(
      s(s"https://vocab.example.org/term/$idx"),
      if (idx % 7 == 0) null else s(s"label $idx"),
      if (idx % 3 == 0) null else s(s"alt $idx"),
      if (idx % 5 == 0) null else s(s"definition $idx"))
  }

  override def next(): Boolean = { i += 1; i < page.limit }
  override def get(): InternalRow = fetchPage(page.offset + i)
  override def close(): Unit = ()
}
