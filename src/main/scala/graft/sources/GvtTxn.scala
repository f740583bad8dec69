package graft.sources

import java.nio.file.{Files, FileAlreadyExistsException, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CROSS-TABLE ATOMIC PUBLISH — the catalog-pointer shape (Nessie /
  * Iceberg-catalog, Delta commit-coordinator): per-table commits stay
  * exactly what [[Gvt]] makes them (immutable, per-table logs), and the
  * MULTI-table atomicity point is ONE createLink of a transaction doc
  * in a coordinator log that pins `(table dir → table version)` for
  * every table in the transaction. Readers who resolve through the
  * transaction view ([[read]]) see a fact table and its summary ONLY at
  * versions one atomic doc pinned together — a crash between the two
  * table appends leaves table-log orphans (invisible through the view,
  * reaped by each table's vacuum) and the view still serves the last
  * complete transaction: neither half-write is ever visible, which is
  * the MVCC contract (data lands first, the pointer swing IS the
  * commit).
  *
  * Concurrency: the txn doc is version-allocated with the same
  * createLink create-if-absent loop as the table log. A loser re-pins
  * against the new predecessor by PER-TABLE MAX-MERGE (its own version
  * vs the predecessor's pin), so the view is monotonic per table —
  * two racing transactions over disjoint tables both land; over the
  * same table, last-merged-wins with no version ever going backward.
  * Idempotence for retried pipelines rides the per-table
  * [[Gvt.appendTxn]] token exactly as in the exactly-once sink.
  *
  * ISOLATION, precisely (r11 advisor finding — the contract is
  * narrowed, not over-claimed): crash atomicity is FULL (a transaction
  * whose doc never linked is invisible at every txn version, forever),
  * DISJOINT-table concurrent transactions are isolated at EVERY doc
  * (the max-merge only ever carries each table's pins forward), and
  * the view CONVERGES — once both racing transactions' docs land, the
  * head pins every table at a version containing both (per-table logs
  * are linear, so max-merge supersets both). What an INTERMEDIATE doc
  * of two concurrent transactions over OVERLAPPING tables does NOT
  * guarantee is mutual snapshot isolation: if txn A and B both write
  * {fact, summary} and their per-table appends interleave opposite to
  * their doc order, A's doc can pin a summary version that already
  * contains B's summary rows while pinning a fact version that lacks
  * B's — B is half-visible for the window until B's own doc lands
  * (DevGvtConcurrent's checktxn phase races exactly this and asserts
  * the final-view convergence plus full isolation for the
  * disjoint-table race). Transactions over overlapping table sets
  * must serialize at the pipeline layer (or ride ONE transaction) —
  * the same rule every catalog-pointer system without a global commit
  * log imposes; the production fix is coordinator-serialized commits
  * (the Nessie shape), a pointer-service concern, not a table-format
  * one.
  *
  * Scale: the coordinator doc is O(tables in the txn) — a few hundred
  * bytes; resolution is one doc read (newest doc id), never a data or
  * manifest read. The table-side cost is unchanged GVT.
  */
object GvtTxn {

  /** One atomic multi-table pin: `tables` maps table dir → the version
    * this transaction made current. */
  final case class TxnDoc(version: Int, tables: Map[String, Int],
      ts: Long = 0L)

  private lazy val mapper: ObjectMapper =
    new ObjectMapper().registerModule(DefaultScalaModule)

  private def logDir(txnDir: String) = Paths.get(txnDir, "_gvt_txn")
  private val DocName = """(\d{8})\.json""".r

  /** Highest committed txn version, or -1 for an empty coordinator. */
  def latestVersion(txnDir: String): Int = {
    val ld = logDir(txnDir)
    if (!Files.isDirectory(ld)) return -1
    val it = Files.list(ld)
    try it.iterator().asScala.map(_.getFileName.toString)
      .collect { case DocName(v) => v.toInt }
      .foldLeft(-1)(math.max)
    finally it.close()
  }

  def docAt(txnDir: String, v: Int): TxnDoc =
    mapper.readValue(Files.readAllBytes(
      logDir(txnDir).resolve(f"$v%08d.json")), classOf[TxnDoc])

  def latest(txnDir: String): Option[TxnDoc] = {
    val v = latestVersion(txnDir)
    if (v < 0) None else Some(docAt(txnDir, v))
  }

  /** Append each `(tableDir, df, statsCols)` to its table, then publish
    * ONE txn doc pinning all the new versions atomically. Returns the
    * txn version. A crash before the doc link leaves the table commits
    * unreferenced by any txn — invisible through [[read]]/[[readAt]].
    * The publish loop max-merges with a racing predecessor per table,
    * so no pinned version ever regresses. */
  def commit(spark: SparkSession, txnDir: String,
      writes: Seq[(String, DataFrame, Seq[String])]): Int = {
    val pins = writes.map { case (dir, df, statsCols) =>
      dir -> Gvt.append(spark, dir, df, statsCols)
    }.toMap
    publish(txnDir, pins)
  }

  /** [[commit]] with an idempotence token — the RETRY-SAFE form a
    * pipeline runs after a crash anywhere in the transaction: each
    * table append rides [[Gvt.appendTxn]] (a table whose append already
    * landed before the crash is NOT duplicated; its committed version
    * is recovered from its log by the token), and the final doc link
    * republishes the same pins (max-merge makes that a monotonic
    * no-op if the doc also landed). Run it as many times as the
    * pipeline retries: exactly one append per table, one consistent
    * pin set. */
  def commitIdempotent(spark: SparkSession, txnDir: String, txnId: String,
      writes: Seq[(String, DataFrame, Seq[String])]): Int = {
    val pins = writes.map { case (dir, df, statsCols) =>
      dir -> Gvt.appendTxn(spark, dir, df, statsCols, txnId).getOrElse(
        Gvt.versionOfTxn(dir, txnId).getOrElse(throw new IllegalStateException(
          s"txn $txnId marked duplicate in $dir but no commit carries it " +
            "(vacuumed past the retry horizon?)")))
    }.toMap
    publish(txnDir, pins)
  }

  /** CROSS-TABLE WRITE-AUDIT-PUBLISH — [[Gvt.createBranch]] composed
    * with the coordinator (r12): each `(tableDir, branchName)` branch
    * is squashed into its parent ([[Gvt.publishBranch]] — the per-table
    * WAP gate re-validates net adds against the parent's CURRENT
    * checks), then ONE txn doc pins every new parent version. Readers
    * through the view flip from "none of the drop anywhere" to "all of
    * it everywhere" at the doc link; a crash between table publishes
    * leaves parent commits the view never pins (the [[commit]] orphan
    * story — harmless history, vacuum-safe). Branches are left in
    * place for the caller to [[Gvt.dropBranch]] after inspection. */
  def publishBranches(spark: SparkSession, txnDir: String,
      branches: Seq[(String, String)]): Int = {
    require(branches.nonEmpty, "a cross-table WAP needs at least one branch")
    val pins = branches.map { case (dir, name) =>
      dir -> Gvt.publishBranch(spark, dir, name)
    }.toMap
    publish(txnDir, pins)
  }

  /** Publish a pin set for table versions committed out-of-band (e.g.
    * a [[Gvt.merge]]/[[Gvt.delete]] pair, or a branch publish) — the
    * same atomic doc, caller-supplied versions. */
  def publish(txnDir: String, pins: Map[String, Int]): Int = {
    require(pins.nonEmpty, "a transaction must pin at least one table")
    val ld = Files.createDirectories(logDir(txnDir))
    var v = latestVersion(txnDir) + 1
    while (true) {
      val merged = if (v == 0) pins else {
        val prev = docAt(txnDir, v - 1).tables
        // per-table max-merge: carry every previously-pinned table
        // forward, never regress one the race partner advanced
        (prev.keySet ++ pins.keySet).map { d =>
          d -> math.max(prev.getOrElse(d, -1), pins.getOrElse(d, -1))
        }.toMap
      }
      val ts = System.currentTimeMillis()
      val tmp = Files.createTempFile(ld, ".tmp-", ".json")
      Files.write(tmp, mapper.writeValueAsBytes(TxnDoc(v, merged, ts)))
      val won =
        try { Files.createLink(ld.resolve(f"$v%08d.json"), tmp); true }
        catch { case _: FileAlreadyExistsException => false }
      Files.delete(tmp)
      if (won) return v
      v = latestVersion(txnDir) + 1
    }
    -1 // unreachable
  }

  /** The pinned version of `tableDir` at txn version `asOf` (newest if
    * None). None if the table was never pinned. */
  def tableVersion(txnDir: String, tableDir: String,
      asOf: Option[Int] = None): Option[Int] = {
    val head = latestVersion(txnDir)
    val v = asOf.getOrElse(head)
    require(v <= head,
      s"GvtTxn at $txnDir has no version $v (head is $head)")
    if (v < 0) None else docAt(txnDir, v).tables.get(tableDir)
  }

  /** Read `tableDir` THROUGH the transaction view: at the version the
    * txn log pins, never the table's own (possibly half-transaction)
    * head. */
  def read(spark: SparkSession, txnDir: String, tableDir: String,
      asOf: Option[Int] = None): DataFrame = {
    val pinned = tableVersion(txnDir, tableDir, asOf).getOrElse(
      throw new IllegalArgumentException(
        s"GvtTxn at $txnDir pins no version of $tableDir" +
          asOf.map(v => s" at txn version $v").getOrElse("")))
    Gvt.read(spark, tableDir, Some(pinned))
  }
}
