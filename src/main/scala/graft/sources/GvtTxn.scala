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
  * of two concurrent [[commit]]s over OVERLAPPING tables does NOT
  * guarantee is mutual snapshot isolation: if txn A and B both write
  * {fact, summary} and their per-table appends interleave opposite to
  * their doc order, A's doc can pin a summary version that already
  * contains B's summary rows while pinning a fact version that lacks
  * B's — B is half-visible for the window until B's own doc lands
  * (DevGvtConcurrent's checktxn phase races exactly this and asserts
  * the final-view convergence plus full isolation for the
  * disjoint-table race). Overlapping-table transactions that need
  * per-doc snapshot isolation use [[commitSerialized]] — the
  * coordinator-serialized CAS loop (the Nessie shape): every attempt
  * re-executes the transaction body against the head doc's pinned
  * snapshot, appends must land CONTIGUOUSLY on that snapshot, the doc
  * link CASes on the head, and any conflict (an interleaved foreign
  * commit, a lost doc race over shared tables) aborts the attempt and
  * re-runs the whole body later — so every doc a serialized writer
  * links pins only whole-transaction states. Within the serialized
  * regime, an UNPINNED table advance older than `staleMs` is a crashed
  * half-transaction and is rolled back ([[Gvt.restore]] to the pinned
  * floor — history preserved, the poison state never enters any new
  * pin). Mixing [[commit]] and [[commitSerialized]] writers on the
  * same tables forfeits the serialized guarantees, exactly as in any
  * catalog that offers both fast and serialized commit modes.
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

  /** COORDINATOR-SERIALIZED commit (the Nessie shape): snapshot
    * isolation at EVERY doc for transactions over OVERLAPPING table
    * sets — see the isolation scaladoc above. `tables` declares the
    * transaction's table set upfront; `body` receives the head doc's
    * pins (dir → pinned version; absent = unborn at this doc) and
    * returns the writes, RECOMPUTED against that snapshot on every
    * attempt (read inputs via `Gvt.read(dir, Some(pin))` — a retried
    * transaction is exactly the transaction started later, the
    * [[Gvt]] rmwRetry contract lifted to the coordinator).
    *
    * Per attempt: (1) validate each table sits exactly at its pinned
    * state — an unpinned advance younger than `staleMs` is a peer's
    * in-flight commit (wait for its doc, then retry), older is a
    * crashed half-transaction (roll it back to the pinned floor with
    * [[Gvt.restore]] — a metadata commit, history preserved); (2) run
    * `body`, append, and require every append landed CONTIGUOUSLY on
    * the validated state (an interleaved foreign commit aborts the
    * attempt — the abandoned appends are the NEXT attempt's stale
    * advance and get rolled back the same way); (3) CAS the doc at
    * head+1 — losing to a doc that touches this transaction's tables
    * aborts (the body must see the new state), losing to a disjoint
    * doc just re-merges and re-links. */
  def commitSerialized(spark: SparkSession, txnDir: String,
      tables: Seq[String],
      body: Map[String, Int] => Seq[(String, DataFrame, Seq[String])],
      staleMs: Long = 10000L, maxRetries: Int = 20): Int =
    commitSerializedOps(spark, txnDir, tables,
      (pins, token) => body(pins).map { case (d, df, statsCols) =>
        // token-carrying append: the attempt token is fresh, so the
        // idempotence scan never fires and Some(v) is guaranteed
        d -> (() => Gvt.appendTxn(spark, d, df, statsCols, token).get)
      }, staleMs, maxRetries)

  /** The GENERAL serialized form: each table contributes ONE arbitrary
    * single-commit Gvt op — merge, delete, updateWhere, overwrite,
    * appendTxn — returned as a thunk yielding its committed version.
    * The settled-walk guarantees the table HEAD state ≡ the pinned
    * state when the op runs, so ops that read the head (merge's probe,
    * delete's touch scan) are reading the snapshot.
    *
    * AUTHORSHIP TOKEN (the hole a version number alone cannot close):
    * `body` receives a per-attempt token that every op MUST pass as
    * its `txn` argument. Without it, a foreign commit landing between
    * the settled walk and the op makes a NO-OP op (a delete matching
    * nothing returns the current head — the foreign version) look
    * exactly like the op's own contiguous commit, and the doc would
    * pin the peer's half-transaction. With it, contiguity is
    * version + authorship: `v == startHead` (a true no-op — nothing
    * can commit without bumping the version) or `v == startHead + 1`
    * AND the commit doc at `v` carries THIS attempt's token.
    * Everything else — re-execution per attempt, CAS, rollback — is
    * the [[commitSerialized]] contract verbatim. */
  def commitSerializedOps(spark: SparkSession, txnDir: String,
      tables: Seq[String],
      body: (Map[String, Int], String) => Seq[(String, () => Int)],
      staleMs: Long = 10000L, maxRetries: Int = 20): Int = {
    require(tables.nonEmpty, "a serialized txn must declare its tables")
    var attempt = 0
    while (attempt < maxRetries) {
      attempt += 1
      // randomized backoff: two writers aborting symmetrically must not
      // re-collide forever
      if (attempt > 1)
        Thread.sleep(50L + scala.util.Random.nextInt(150 * attempt))
      val headV = latestVersion(txnDir)
      val base: Map[String, Int] =
        if (headV < 0) Map.empty else docAt(txnDir, headV).tables
      // manifest-identity check: a restore commit has a HIGHER version
      // than the pin but the SAME state, so "at the pinned state" is
      // file-set equality, never version equality (production compares
      // a manifest digest instead of the driver Seq)
      def ident(d: String, v: Int) =
        Gvt.snapshot(d, Some(v)).map(f =>
          (f.path, Option(f.dv).getOrElse(Nil), f.dvRows)).toSet
      // (1) every declared table must sit at its pinned state; record
      // the validated head as the contiguity baseline (re-reading later
      // would let a foreign commit slip under the appends unseen)
      val startHeads = scala.collection.mutable.Map.empty[String, Int]
      val settled = tables.forall { d =>
        val bv = base.getOrElse(d, -1)
        val hv = Gvt.latestVersion(d)
        // pinned state reached: version at/below the pin, same file set
        // as the pin (restores bump the version, not the state), or —
        // for a never-pinned table — the empty state
        if (hv <= bv ||
            (bv >= 0 && ident(d, hv) == ident(d, bv)) ||
            (bv < 0 && ident(d, hv).isEmpty)) {
          startHeads(d) = hv; true
        } else {
          // unpinned advance: a peer's doc may still be coming.
          // Staleness is the ADVANCING COMMIT's own age (its publish
          // ts), and only a doc RAISING THIS TABLE'S PIN ends the wait
          // early — coordinator-wide doc traffic from disjoint-table
          // writers must neither reset the window nor burn retry
          // attempts (r13 review findings, both passes).
          def ageMs = System.currentTimeMillis() - Gvt.commitAt(d, hv).ts
          var headSeen = headV
          var pinRaised = false
          while (!pinRaised && ageMs < staleMs) {
            Thread.sleep(50)
            val h2 = latestVersion(txnDir)
            if (h2 > headSeen) {
              headSeen = h2
              pinRaised = docAt(txnDir, h2).tables.getOrElse(d, -1) > bv
            }
          }
          // stale: a crashed half-transaction in the serialized
          // regime — roll the table back to the pinned floor
          if (!pinRaised) rollBack(spark, d, bv)
          false // base may have moved either way: re-read and retry
        }
      }
      if (settled) {
        val basePins = tables.flatMap(d =>
          base.get(d).map(d -> _)).toMap
        val token = java.util.UUID.randomUUID().toString
        val writes = body(basePins, token)
        require(writes.map(_._1).toSet.subsetOf(tables.toSet),
          "body wrote a table outside the declared set")
        // one write per table: a second commit on the same table would
        // land at startHead+2 and fail contiguity on EVERY attempt —
        // refuse upfront instead of spinning to maxRetries (r13 review)
        require(writes.map(_._1).distinct.size == writes.size,
          "a serialized txn writes each table at most once — union the " +
            "frames instead")
        val myPins = writes.map { case (d, op) => d -> op() }.toMap
        // (2) contiguity + authorship: a true no-op (head version
        // unchanged — nothing can commit without bumping it), or one
        // commit that provably carries THIS attempt's token
        val contiguous = myPins.forall { case (d, v) =>
          v == startHeads(d) ||
            (v == startHeads(d) + 1 && Gvt.commitAt(d, v).txn == token)
        }
        var aborted = !contiguous
        if (contiguous) {
          // (3) doc CAS on the head; disjoint losers re-merge, shared
          // losers abort to re-execute the body
          var v = headV + 1
          while (!aborted) {
            val prev: Map[String, Int] =
              if (v == 0) Map.empty else docAt(txnDir, v - 1).tables
            val merged = (prev.keySet ++ myPins.keySet).map { d =>
              d -> math.max(prev.getOrElse(d, -1), myPins.getOrElse(d, -1))
            }.toMap
            if (tryLinkDoc(txnDir, v, merged)) return v
            // lost: if the winner touched our tables, the body must
            // re-execute against the new state; otherwise re-link
            val winner = docAt(txnDir, v).tables
            if (tables.exists(d =>
                winner.getOrElse(d, -1) != base.getOrElse(d, -1)))
              aborted = true
            else v += 1
          }
        }
        if (aborted) {
          // best-effort IMMEDIATE rollback of our own abandoned
          // commits: waiting for the staleness walk to rediscover them
          // would cost a full staleMs per collision (r13 review). Only
          // a commit that provably carries OUR token and is still the
          // head rolls back here (rolling to just below it preserves
          // any peer commit underneath); anything racier — including a
          // no-op that returned a foreign version — is the walk's job.
          myPins.foreach { case (d, v) =>
            if (v > startHeads(d) && Gvt.latestVersion(d) == v &&
                Gvt.commitAt(d, v).txn == token)
              rollBack(spark, d, v - 1)
          }
        }
      }
    }
    throw new java.util.ConcurrentModificationException(
      s"GvtTxn at $txnDir: serialized commit lost $maxRetries attempts — " +
        "sustained overlapping-table contention should surface, not spin")
  }

  /** Roll `d` back to `floor` (the pinned state) — or, for a
    * never-pinned table (floor < 0, the bootstrap crash), to the EMPTY
    * state via one delete-everything commit (the deleteKeys
    * empty-survivor shape). Best-effort: losing a publish race or a
    * restore conflict just fails this ATTEMPT (the caller re-reads and
    * retries), never the whole serialized commit (r13 review). */
  private def rollBack(spark: SparkSession, d: String, floor: Int): Unit =
    try {
      if (floor >= 0) { Gvt.restore(spark, d, floor); () }
      else {
        Gvt.tryPublish(d, Gvt.GvtCommit(Gvt.latestVersion(d) + 1,
          "delete", Nil, Gvt.snapshot(d).map(_.path)), spark)
        ()
      }
    } catch {
      case _: java.util.ConcurrentModificationException => ()
    }

  /** The coordinator's atomic doc-link primitive — ONE definition of
    * the tmp-file + createLink + FileAlreadyExistsException wire
    * protocol, shared by [[publish]] and [[commitSerialized]] so the
    * two commit paths cannot diverge (r13 review; the
    * createLink-vs-rename rationale lives at [[Gvt.tryPublish]]). */
  private def tryLinkDoc(txnDir: String, v: Int,
      pins: Map[String, Int]): Boolean = {
    val ld = Files.createDirectories(logDir(txnDir))
    val tmp = Files.createTempFile(ld, ".tmp-", ".json")
    Files.write(tmp, mapper.writeValueAsBytes(
      TxnDoc(v, pins, System.currentTimeMillis())))
    val won =
      try { Files.createLink(ld.resolve(f"$v%08d.json"), tmp); true }
      catch { case _: FileAlreadyExistsException => false }
    Files.delete(tmp)
    won
  }

  /** Publish a pin set for table versions committed out-of-band (e.g.
    * a [[Gvt.merge]]/[[Gvt.delete]] pair, or a branch publish) — the
    * same atomic doc, caller-supplied versions. */
  def publish(txnDir: String, pins: Map[String, Int]): Int = {
    require(pins.nonEmpty, "a transaction must pin at least one table")
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
      if (tryLinkDoc(txnDir, v, merged)) return v
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
