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
  * createLink create-if-absent loop as the table log. Docs carry only
  * their OWN transaction's pins (r14); the cumulative view is the
  * read-side PER-TABLE MAX-MERGE fold ([[pins]]), so the view is
  * monotonic per table by construction — two racing transactions over
  * disjoint tables both land; over the same table, max-wins with no
  * version ever going backward (a loser simply re-links one version
  * up; nothing is carried forward that a race could regress).
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
  * bytes, carrying ONLY the transaction's own pins (r14; pre-r14 docs
  * carried the full max-merged map forward, making every doc O(tables
  * ever pinned)). The cumulative view is resolved the table-log way:
  * a full-map CHECKPOINT every [[CheckpointEvery]] docs plus a
  * max-merge fold over the ≤[[CheckpointEvery]]-doc tail ([[pins]]),
  * so resolution is O(tail) doc reads regardless of coordinator age,
  * and [[vacuum]] reaps pre-checkpoint docs behind a recorded
  * retention floor so the directory listing [[latestVersion]] stays
  * O(retained docs). The table-side cost is unchanged GVT.
  *
  * RETENTION INTERACTION with the table policy
  * (`spark.graft.gvt.tableRetain` — ADVICE r15): a coordinator pin of
  * an old table version outlives R table commits whenever the
  * coordinator is quieter than the table. Since r16 this is closed
  * MECHANICALLY, not by operator discipline: every doc link marks its
  * pinned tables ([[markCoordinator]]), and the table auto-vacuum
  * clamps its reap target at [[oldestLivePin]] — this coordinator's
  * own [[vacuum]] (or the `txnRetain` policy) is what releases old
  * pins and lets the table floor advance. A MANUAL table vacuum below
  * the clamp remains allowed (explicit operator intent), with the
  * documented consequence: a pin older than the table floor dies with
  * the history.
  */
object GvtTxn {

  /** One atomic multi-table pin: `tables` maps table dir → the version
    * this transaction made current. Since r14 a doc carries only ITS
    * OWN transaction's pins (the cumulative view is [[pins]]'s fold);
    * pre-r14 docs carried the cumulative map — the max-merge fold
    * treats both identically (folding an already-cumulative map is a
    * monotone no-op), so mixed-era logs resolve correctly. */
  final case class TxnDoc(version: Int, tables: Map[String, Int],
      ts: Long = 0L)

  /** Full cumulative pin map at `version` — the fold anchor, exactly
    * the table log's [[Gvt.GvtCheckpoint]] shape. */
  final case class TxnCheckpoint(version: Int, tables: Map[String, Int])

  /** DEFAULT checkpoint cadence: [[pins]] reads ≤ this many docs plus
    * one checkpoint, regardless of coordinator age (the table log's
    * [[Gvt.CheckpointEvery]] scheme, one rung up). Tunable per session
    * via `spark.graft.gvt.txnCheckpointEvery` (r15 — an object-store
    * coordinator wants a longer cadence, its doc reads being the cheap
    * op and its LIST the expensive one): resolution never assumes a
    * regular cadence (it anchors at the NEWEST checkpoint ≤ v), so
    * mixing cadences across a log's life is safe by construction. */
  val CheckpointEvery = 10

  /** Session conf, wherever the call site has one: explicit spark
    * params win; bare entry points ([[publish]]) fall back to the
    * thread's active/default session, so a knob set on the session a
    * pipeline runs under governs its whole GvtTxn surface. */
  private def sessionOf(spark: SparkSession): Option[SparkSession] =
    Option(spark).orElse(SparkSession.getActiveSession)
      .orElse(SparkSession.getDefaultSession)

  private def intKnob(spark: Option[SparkSession], key: String,
      dflt: Int): Int = {
    val v = spark.flatMap(_.conf.getOption(key)).map(_.toInt).getOrElse(dflt)
    require(v >= 1, s"$key must be >= 1, got $v")
    v
  }

  /** Cadence knob, parsed UPFRONT at every entry point (the r14
    * lesson: a malformed value must fail before the commit point, not
    * between the doc link and the maintenance trigger). */
  private def txnCheckpointEvery(spark: Option[SparkSession]): Int =
    intKnob(spark, "spark.graft.gvt.txnCheckpointEvery", CheckpointEvery)

  /** AUTO-VACUUM policy knob (r15, the r14 verdict's #1): the number
    * of coordinator docs of txn-view time travel to RETAIN behind the
    * head. Unset (the default) = no policy — vacuum stays manual, no
    * history is ever reaped without an explicit call. Set to R ≥ 1,
    * every successful doc link checks the retained span from the SAME
    * directory listing the link already paid for, and once it reaches
    * 2R the publisher vacuums to head−R (hysteresis: the floor
    * advances in R-sized steps, so vacuum runs once per R docs, not
    * per publish, and the span stays within [R, 2R]). Pick R well
    * above any in-flight reader's age — the same grace discipline as
    * a manual [[vacuum]]; below-floor reads keep failing loudly. */
  private def txnRetain(spark: Option[SparkSession]): Option[Int] =
    spark.flatMap(_.conf.getOption("spark.graft.gvt.txnRetain")).map { s =>
      val r = s.toInt
      require(r >= 1, s"spark.graft.gvt.txnRetain must be >= 1, got $r")
      r
    }

  private lazy val mapper: ObjectMapper =
    new ObjectMapper().registerModule(DefaultScalaModule)

  private def logDir(txnDir: String) = Paths.get(txnDir, "_gvt_txn")
  private def docPath(txnDir: String, v: Int) =
    logDir(txnDir).resolve(f"$v%08d.json")
  private def ckptPath(txnDir: String, v: Int) =
    logDir(txnDir).resolve(f"$v%08d.ckpt.json")
  private object DocName {
    private val Re = raw"(\d{8})\.json".r
    def unapply(name: String): Option[Int] =
      name match { case Re(d) => Some(d.toInt); case _ => None }
  }
  private object CkptName {
    private val Re = raw"(\d{8})\.ckpt\.json".r
    def unapply(name: String): Option[Int] =
      name match { case Re(d) => Some(d.toInt); case _ => None }
  }
  private object VacuumName {
    private val Re = raw"(\d{8})\.vacuum\.json".r
    def unapply(name: String): Option[Int] =
      name match { case Re(d) => Some(d.toInt); case _ => None }
  }

  /** Highest committed txn version, or -1 for an empty coordinator.
    * One directory listing, O(retained docs) — [[vacuum]] is what
    * keeps "retained" bounded on a long-lived coordinator. */
  def latestVersion(txnDir: String): Int = {
    val ld = logDir(txnDir)
    if (!Files.isDirectory(ld)) return -1
    val it = Files.list(ld)
    try it.iterator().asScala.map(_.getFileName.toString)
      .collect { case DocName(v) => v }
      .foldLeft(-1)(math.max)
    finally it.close()
  }

  /** Oldest txn version still resolvable (0 if never vacuumed): the
    * max floor recorded by [[vacuum]] markers. */
  def vacuumFloor(txnDir: String): Int = {
    val ld = logDir(txnDir)
    if (!Files.isDirectory(ld)) return 0
    val it = Files.list(ld)
    try it.iterator().asScala.map(_.getFileName.toString)
      .collect { case VacuumName(v) => v }
      .foldLeft(0)(math.max)
    finally it.close()
  }

  def docAt(txnDir: String, v: Int): TxnDoc =
    mapper.readValue(Files.readAllBytes(docPath(txnDir, v)),
      classOf[TxnDoc])

  def latest(txnDir: String): Option[TxnDoc] = {
    val v = latestVersion(txnDir)
    if (v < 0) None else Some(docAt(txnDir, v))
  }

  /** ONE directory listing yielding (head doc version, retention
    * floor, newest ckpt ≤ `upTo`) — on an unvacuumed 10⁵-doc dir the
    * listing IS the resolution cost, so every read-path entry
    * ([[pins]], [[tableVersion]], [[read]]) pays it exactly once. */
  private def scanLog(txnDir: String, upTo: Int): (Int, Int, Int) = {
    val ld = logDir(txnDir)
    if (!Files.isDirectory(ld)) return (-1, 0, -1)
    var head = -1
    var floor = 0
    var ckptVersion = -1
    val it = Files.list(ld)
    try it.iterator().asScala.map(_.getFileName.toString).foreach {
      case DocName(d) => if (d > head) head = d
      case CkptName(c) if c <= upTo => if (c > ckptVersion) ckptVersion = c
      case VacuumName(f) => if (f > floor) floor = f
      case _ => ()
    } finally it.close()
    (head, floor, ckptVersion)
  }

  /** The CUMULATIVE pin map at txn version `v` — newest checkpoint
    * ≤ v plus a max-merge fold of the ≤[[CheckpointEvery]]-doc tail.
    * This is THE resolution primitive ([[tableVersion]]/[[read]] are
    * views of it): O(tail) doc reads at any coordinator age, the
    * table log's anchor-plus-tail walk one rung up. Old (pre-r14)
    * cumulative docs fold identically — max-merge is monotone. */
  def pins(txnDir: String, v: Int): Map[String, Int] = {
    require(v >= 0, s"GvtTxn at $txnDir: no pins at version $v")
    // re-list on NoSuchFileException: a concurrent [[vacuum]]'s
    // unlinks can make readdir miss the fresh anchor checkpoint (the
    // table log's resolveManifest race, same fix — r14)
    var attempt = 0
    while (true) {
      val (_, floor, ckptVersion) = scanLog(txnDir, v)
      try return foldPins(txnDir, v, floor, ckptVersion)
      catch {
        case _: java.nio.file.NoSuchFileException if attempt < 5 =>
          attempt += 1; Thread.sleep(20L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def foldPins(txnDir: String, v: Int, floor: Int,
      ckptVersion: Int): Map[String, Int] = {
    require(v >= floor,
      s"GvtTxn at $txnDir: version $v was vacuumed (floor $floor) — " +
        "time travel below the retention floor is gone by design")
    val acc = scala.collection.mutable.HashMap.empty[String, Int]
    if (ckptVersion >= 0)
      mapper.readValue(Files.readAllBytes(ckptPath(txnDir, ckptVersion)),
        classOf[TxnCheckpoint]).tables.foreach { case (d, p) =>
        acc(d) = p
      }
    ((ckptVersion + 1) to v).foreach { vv =>
      docAt(txnDir, vv).tables.foreach { case (d, p) =>
        if (acc.getOrElse(d, -1) < p) acc(d) = p
      }
    }
    acc.toMap
  }

  /** Best-effort checkpoint after the doc at `v` linked: the full
    * [[pins]] fold at v, idempotent via createLink. A lost race or
    * failure here only costs replay length (the next fold anchors one
    * checkpoint earlier), never correctness — the table log's exact
    * contract. A swallow is COUNTED and WARNED
    * ([[GvtMaintenance.txnCkptSwallowed]], r15): a persistently
    * failing writer degrades resolution to O(log) and must be visible
    * doing so. */
  private def maybeCheckpoint(txnDir: String, v: Int,
      every: Int = CheckpointEvery): Unit =
    if (v > 0 && v % every == 0)
      try {
        GvtMaintenance.txnCkptFailpoint()
        val merged = pins(txnDir, v)
        val ld = logDir(txnDir)
        val tmp = Files.createTempFile(ld, ".tmp-", ".ckpt")
        Files.write(tmp, mapper.writeValueAsBytes(TxnCheckpoint(v, merged)))
        try Files.createLink(ckptPath(txnDir, v), tmp)
        catch { case _: FileAlreadyExistsException => () }
        Files.delete(tmp)
      } catch {
        case scala.util.control.NonFatal(e) => GvtMaintenance.swallow(
          GvtMaintenance.txnCkptSwallowed, s"txn checkpoint@$v ($txnDir)", e)
      }

  /** AUTO-VACUUM trigger, run after a successful doc link with the
    * floor the linking listing already observed (zero extra IO when
    * the policy is off or the span hasn't crossed): once the retained
    * span reaches 2R, vacuum to v−R. Best-effort like every
    * maintenance step — the doc is linked, so a vacuum failure (or a
    * lost race with a peer's vacuum) must not fail the commit; it is
    * counted and warned ([[GvtMaintenance.autoVacuumSwallowed]]) and
    * the policy re-fires on the next crossing. */
  private def maybeAutoVacuum(txnDir: String, v: Int, floor: Int,
      retain: Option[Int]): Unit =
    retain.foreach { r =>
      if (v - floor >= 2 * r && v - r > floor)
        try { vacuum(txnDir, v - r); () }
        catch {
          case scala.util.control.NonFatal(e) => GvtMaintenance.swallow(
            GvtMaintenance.autoVacuumSwallowed,
            s"txn auto-vacuum(${v - r}) ($txnDir)", e)
        }
    }

  /** VACUUM the coordinator log: ensure a checkpoint AT `retainFrom`
    * (the anchor replay never needs the doomed docs), record the new
    * retention floor (atomic create, BEFORE any deletion — a crash
    * mid-vacuum leaves extra docs but never a resolvable-looking
    * version with missing pins), then delete docs, checkpoints, and
    * older floor markers strictly below. Returns docs deleted.
    *
    * RETENTION CONTRACT: txn-view time travel ([[read]]/[[pins]] with
    * `asOf < retainFrom`) is gone by design and fails loudly. The
    * per-table [[Gvt.appendTxn]] idempotence horizon is INDEPENDENT of
    * this vacuum — a retried [[commitIdempotent]] recovers a crashed
    * table append from the TABLE log's token scan
    * ([[Gvt.versionOfTxn]]), never from coordinator docs, so reaping
    * coordinator history cannot break retry-safety; only each table's
    * own vacuum can (and that contract is documented there). Run with
    * `retainFrom` safely behind any in-flight reader's anchor — the
    * same grace discipline as the table vacuum.
    *
    * A checkpointer paused across this vacuum can re-link a BELOW-floor
    * checkpoint afterwards (its fold ran pre-vacuum). That file is
    * inert, not a hazard: [[foldPins]] rejects `v < floor` before any
    * anchor is read, every `v >= floor` read prefers the newer
    * floor-anchor this vacuum guaranteed, and the next vacuum reaps
    * it with everything else below its floor. */
  def vacuum(txnDir: String, retainFrom: Int): Int = {
    val head = latestVersion(txnDir)
    require(retainFrom >= 0 && retainFrom <= head,
      s"GvtTxn vacuum retainFrom $retainFrom outside [0, $head]")
    if (retainFrom < vacuumFloor(txnDir)) return 0
    val ld = logDir(txnDir)
    if (!Files.exists(ckptPath(txnDir, retainFrom))) {
      val merged = pins(txnDir, retainFrom)
      val tmp = Files.createTempFile(ld, ".tmp-", ".ckpt")
      Files.write(tmp,
        mapper.writeValueAsBytes(TxnCheckpoint(retainFrom, merged)))
      try Files.createLink(ckptPath(txnDir, retainFrom), tmp)
      catch { case _: FileAlreadyExistsException => () }
      Files.delete(tmp)
    }
    val mtmp = Files.createTempFile(ld, ".tmp-", ".vac")
    Files.write(mtmp, s"""{"floor":$retainFrom}""".getBytes("UTF-8"))
    try Files.createLink(
      ld.resolve(f"$retainFrom%08d.vacuum.json"), mtmp)
    catch { case _: FileAlreadyExistsException => () }
    Files.delete(mtmp)
    var deleted = 0
    // deleteIfExists, not delete: with the r15 auto-vacuum policy two
    // publishers can run overlapping vacuums concurrently, and the
    // loser of any single unlink race must keep reaping, not abort
    // half-done with a spurious NoSuchFileException
    val it = Files.list(ld)
    try it.iterator().asScala.foreach { p =>
      p.getFileName.toString match {
        case DocName(v) if v < retainFrom =>
          if (Files.deleteIfExists(p)) deleted += 1
        case CkptName(v) if v < retainFrom =>
          if (Files.deleteIfExists(p)) deleted += 1
        case VacuumName(v) if v < retainFrom =>
          if (Files.deleteIfExists(p)) deleted += 1
        case _ => ()
      }
    } finally it.close()
    deleted
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
    // stale-wait poll cadence: 50 ms suits a local filesystem; an
    // object-store coordinator wants a gentler poll (r13 verdict nit)
    val pollMs = spark.conf.getOption("spark.graft.gvt.txnPollMs")
      .map(_.toLong).getOrElse(50L)
    // maintenance knobs parsed upfront, before any attempt's body or
    // link can commit (r14 lesson)
    val every = txnCheckpointEvery(Some(spark))
    val retain = txnRetain(Some(spark))
    var attempt = 0
    while (attempt < maxRetries) {
      attempt += 1
      // randomized backoff: two writers aborting symmetrically must not
      // re-collide forever
      if (attempt > 1)
        Thread.sleep(50L + scala.util.Random.nextInt(150 * attempt))
      val (headV, floorV, _) = scanLog(txnDir, Int.MaxValue)
      // null = a peer's (auto-)vacuum raised the floor past our
      // freshly-listed head before we could fold it — the snapshot is
      // gone, so burn THIS attempt and re-list, exactly like losing a
      // CAS (r15: possible once the txnRetain policy makes vacuums
      // routine; requires ≥R foreign docs landing inside our listing
      // window, so it only fires under hot contention)
      val base: Map[String, Int] =
        if (headV < 0) Map.empty
        else try pins(txnDir, headV)
        catch {
          case e: IllegalArgumentException
              if e.getMessage != null && e.getMessage.contains("vacuumed") =>
            null
        }
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
      val settled = base != null && tables.forall { d =>
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
            Thread.sleep(pollMs)
            val h2 = latestVersion(txnDir)
            if (headSeen < h2) {
              pinRaised = pinRaisedIn(txnDir, d, bv, headSeen, h2)
              headSeen = h2
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
          // (3) doc CAS on the head; disjoint losers re-link one
          // version up, shared losers abort to re-execute the body.
          // The doc carries ONLY this txn's pins (r14 delta docs) —
          // the cumulative view is [[pins]]'s fold, so no prev read
          // or merge happens on the commit path at all.
          var v = headV + 1
          while (!aborted) {
            if (tryLinkDoc(txnDir, v, myPins)) {
              maybeCheckpoint(txnDir, v, every)
              maybeAutoVacuum(txnDir, v, floorV, retain)
              return v
            }
            // lost: if the winner RAISED any of our tables' pins, the
            // body must re-execute against the new state; otherwise
            // re-link (a replayed idempotent doc re-carrying an old
            // pin raises nothing and burns no attempt). A winner doc
            // VACUUMED before we can read it (r15: the body ran for a
            // while and peers published+reaped ≥R docs past it) means
            // the base is long stale — abort and re-execute.
            val winner =
              try docAt(txnDir, v).tables
              catch { case _: java.nio.file.NoSuchFileException => null }
            if (winner == null || tables.exists(d =>
                winner.getOrElse(d, -1) > base.getOrElse(d, -1)))
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

  /** Did any doc in (fromExclusive, to] raise `d`'s pin above `bv`?
    * The stale-wait walk's doc scan: docs carry per-txn deltas (r14),
    * so each NEW doc is checked for a pin of THIS table above the
    * base — cumulative pre-r14 docs satisfy the same test whenever
    * the pin rose. A doc VACUUMED out from under the walk (a
    * concurrent [[vacuum]] — routine once the r15 auto-policy is on)
    * is not an abort: every reaped doc's pins are folded into the
    * floor's anchor checkpoint, so the walk falls back to the
    * cumulative [[pins]] fold at `to`, which carries its own
    * re-list-and-retry (the r14 readdir-miss fix applied here too —
    * ADVICE r14). */
  private[sources] def pinRaisedIn(txnDir: String, d: String, bv: Int,
      fromExclusive: Int, to: Int): Boolean = {
    var v = fromExclusive
    while (v < to) {
      v += 1
      val raised =
        try docAt(txnDir, v).tables.getOrElse(d, -1) > bv
        catch {
          case _: java.nio.file.NoSuchFileException =>
            // the cumulative fold itself can find `to` BELOW the floor
            // (ADVICE r15): a concurrent auto-vacuum can raise the
            // floor past `to` between the caller's latestVersion read
            // and this fold (peers publish ≥R docs and reap). That is
            // the vacuumed-BASE shape one level up, not a walk failure
            // — treat it the same way: report the pin as raised, which
            // ends the stale-wait WITHOUT a rollback and burns only
            // this attempt (the retry re-lists and re-folds), instead
            // of escaping commitSerializedOps and failing the whole
            // serialized commit in exactly the hot-contention regime
            // the policy makes routine. Honest too: ≥R foreign docs
            // landed since the base listing, so the base is long stale
            // regardless of this table's pin.
            return try pins(txnDir, to).getOrElse(d, -1) > bv
            catch {
              case e: IllegalArgumentException
                  if e.getMessage != null &&
                    e.getMessage.contains("vacuumed") => true
            }
        }
      if (raised) return true
    }
    false
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
    if (won) pins.keys.foreach(markCoordinator(txnDir, _))
    won
  }

  /** Leave a COORDINATOR MARKER at the pinned table (r16, closing the
    * documented tableRetain footgun mechanically): `<table>/_gvt_coord`
    * names the coordinator whose docs pin this table's versions, so
    * the table's OWN auto-vacuum policy ([[Gvt]]'s `tableRetain`) can
    * clamp its reap target at the coordinator's oldest live pin
    * ([[oldestLivePin]]) instead of relying on the operator to size R
    * above every pin's age. Written once per table (one `exists` probe
    * + one ~50-byte read per doc link after that — cheap next to the
    * link's own temp-file write); a table re-pointed at a NEW
    * coordinator overwrites on content mismatch, last coordinator
    * wins. BOTH write paths are atomic (createLink / ATOMIC_MOVE): a
    * torn marker read would resolve to a garbage coordinator with no
    * docs, whose [[oldestLivePin]] is None — silently UNCLAMPING the
    * reap, the one failure direction the clamp must not have.
    * Best-effort and counted like every maintenance write: the doc is
    * already linked, and a lost marker only re-opens the documented
    * (pre-r16) operator contract. */
  private def markCoordinator(txnDir: String, tableDir: String): Unit =
    try {
      val p = Paths.get(tableDir, "_gvt_coord")
      val want = Paths.get(txnDir).toAbsolutePath.normalize.toString
      // a pin of a dir that is not (yet) a table gets no marker — the
      // clamp matters only once data files can be reaped
      if (!Files.isDirectory(p.getParent)) return
      if (!Files.exists(p)) {
        val tmp = Files.createTempFile(p.getParent, ".tmp-", ".coord")
        Files.write(tmp, want.getBytes("UTF-8"))
        try Files.createLink(p, tmp)
        catch { case _: FileAlreadyExistsException => () }
        Files.delete(tmp)
      } else if (new String(Files.readAllBytes(p), "UTF-8") != want) {
        val tmp = Files.createTempFile(p.getParent, ".tmp-", ".coord")
        Files.write(tmp, want.getBytes("UTF-8"))
        Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    } catch {
      case scala.util.control.NonFatal(e) => GvtMaintenance.swallow(
        GvtMaintenance.coordMarkSwallowed,
        s"coordinator marker ($tableDir -> $txnDir)", e)
    }

  /** The coordinator named by a table's marker, if any. */
  private[sources] def coordinatorOf(tableDir: String): Option[String] = {
    val p = Paths.get(tableDir, "_gvt_coord")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), "UTF-8"))
    else None
  }

  /** OLDEST LIVE PIN of `tableDir` across every still-resolvable txn
    * version — the table-version no table vacuum may reap while this
    * coordinator's retained history can still be read. The cumulative
    * pin map is a per-table MAX-MERGE fold, hence monotone
    * non-decreasing in the txn version, so the minimum over the
    * retained range [floor, head] is the pin AT the floor — one
    * checkpoint read (the vacuum-guaranteed anchor), no walk. A table
    * first pinned ABOVE the floor has no pin at the floor; its oldest
    * live pin is then the first doc (in version order) that carries
    * it — an O(tail) scan of the docs the resolution fold reads
    * anyway, and only on the auto-vacuum trigger path (once per R
    * table commits), never per read. None = this coordinator holds no
    * live pin of the table (nothing to clamp). Raced docs/vacuums
    * surface as exceptions for the caller's fail-SAFE skip. */
  private[sources] def oldestLivePin(txnDir: String,
      tableDir: String): Option[Int] = {
    val (head, floor, _) = scanLog(txnDir, Int.MaxValue)
    if (head < 0) return None
    val want = Paths.get(tableDir).toAbsolutePath.normalize
    def pinIn(m: Map[String, Int]): Option[Int] =
      m.collectFirst {
        case (d, p) if Paths.get(d).toAbsolutePath.normalize == want => p
      }
    pinIn(pins(txnDir, math.max(floor, 0))).orElse {
      ((math.max(floor, 0) + 1) to head).iterator
        .flatMap(v => pinIn(docAt(txnDir, v).tables))
        .nextOption()
    }
  }

  /** Publish a pin set for table versions committed out-of-band (e.g.
    * a [[Gvt.merge]]/[[Gvt.delete]] pair, or a branch publish) — the
    * same atomic doc, caller-supplied versions. The doc carries ONLY
    * this call's pins (r14 delta docs; per-table monotonicity is the
    * read-side max-merge fold — a racing partner's advance can never
    * be regressed because nothing is ever carried forward to regress).
    * Lost links back off with jitter so two hot racing publishers
    * de-synchronize instead of spinning on doc reads (r13 verdict). */
  def publish(txnDir: String, pins: Map[String, Int]): Int = {
    require(pins.nonEmpty, "a transaction must pin at least one table")
    // knobs parsed BEFORE the commit point (the doc link): a malformed
    // value fails the publish upfront, never between the link and the
    // maintenance it governs (r14 lesson, same as deleteWhereDV's)
    val sess = sessionOf(null)
    val every = txnCheckpointEvery(sess)
    val retain = txnRetain(sess)
    // head AND retention floor from the one listing the publish
    // already pays — the auto-vacuum span check costs no extra IO
    val (head, floor, _) = scanLog(txnDir, Int.MaxValue)
    var v = head + 1
    var lost = 0
    while (true) {
      if (tryLinkDoc(txnDir, v, pins)) {
        maybeCheckpoint(txnDir, v, every)
        maybeAutoVacuum(txnDir, v, floor, retain)
        return v
      }
      lost += 1
      Thread.sleep(1L + scala.util.Random.nextInt(20 * math.min(lost, 10)))
      v = latestVersion(txnDir) + 1
    }
    -1 // unreachable
  }

  /** The pinned version of `tableDir` at txn version `asOf` (newest if
    * None). None if the table was never pinned. One listing: head,
    * floor, and the checkpoint anchor come from the same [[scanLog]]
    * pass (a checkpoint version is always ≤ the head doc's, so the
    * unbounded anchor scan is exact for the head read). */
  def tableVersion(txnDir: String, tableDir: String,
      asOf: Option[Int] = None): Option[Int] = {
    var attempt = 0
    while (true) {
      val (head, floor, ckptAll) =
        scanLog(txnDir, asOf.getOrElse(Int.MaxValue))
      val v = asOf.getOrElse(head)
      require(v <= head,
        s"GvtTxn at $txnDir has no version $v (head is $head)")
      if (v < 0) return None
      try return foldPins(txnDir, v, floor, ckptAll).get(tableDir)
      catch {
        // concurrent-vacuum readdir miss: re-list (see [[pins]])
        case _: java.nio.file.NoSuchFileException if attempt < 5 =>
          attempt += 1; Thread.sleep(20L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
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
