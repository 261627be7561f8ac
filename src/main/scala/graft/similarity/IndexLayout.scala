package graft.similarity

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** VERSIONED SNAPSHOT LAYOUT for the persistent ANN indexes — the
  * reader-isolation contract the rename-swap layout could not give.
  *
  * Problem (the r10 adjudication): `ivfPqIndexMaintain` swapped
  * postings/pqcents/centroids via rename-aside -> rename-fresh per
  * artifact, and `ivfIndexCompact` did the same per cell directory.
  * Writers are leased, but READERS take no lock: a serve that plans
  * or lists files inside the swap window sees a missing artifact or
  * cell (FileNotFoundException) — at gate scale a milliseconds
  * window, at 100 TB with a serving fleet and a multi-minute rebuild
  * a real outage-or-wrong-topk window.
  *
  * Contract here: artifact directories are IMMUTABLE-ONCE-REPLACED
  * (appends add files, replacements write NEW directories), and the
  * live set is named by ONE small manifest file committed atomically
  * — so a reader that resolved a manifest always sees a complete,
  * internally consistent snapshot, never a rename hole.
  *
  * Layout under an index root `path`:
  *   - `manifest-v<NNNNNNNNNNNN>`   ordered commit log; the HIGHEST
  *     version is live. Commit = write `.manifest-tmp-<uuid>`, then
  *     rename to the (never pre-existing) final name — rename to a
  *     fresh name is atomic on HDFS/posix, so readers see a whole
  *     manifest or none. Old manifests are kept `keepManifests` deep:
  *     the PREVIOUS snapshot stays fully readable, which is the GC
  *     grace window (a reader must only finish its scan before TWO
  *     further maintenance commits land).
  *   - `centroids-v<V>` / `pqcents-v<V>`   replaced whole per commit.
  *   - `postings-g<V>`   postings GENERATIONS: appends add files to
  *     the NEWEST generation in place (additive — Spark commits data
  *     files atomically, so concurrent readers just see the old file
  *     set); compaction rewrites heavy cells into a NEW generation
  *     and EXCLUDES them from older generations in the manifest —
  *     older generation directories are never touched, so the old
  *     snapshot keeps serving. The live postings relation is the
  *     union over generations of (files minus excluded cells).
  *
  * Generation growth is bounded: each compaction adds one
  * generation, and once the live count would exceed [[MaxGens]] the
  * compactor folds every non-base generation's live cells into the
  * new one (those cells are already compact, so the fold is cheap),
  * collapsing the list back to ~2.
  *
  * Double-writer safety (the StoreLock epoch discipline, moved to
  * where it can abort BEFORE damage): every mutation stamps
  * `<path>.epoch` on entry; [[commit]] re-reads the epoch and throws
  * if it no longer carries the committing writer's token — on object
  * stores where create-if-absent degrades to advisory and two
  * writers both enter, the LOSER now aborts before publishing a
  * manifest, so the surviving snapshot is the winner's alone.
  *
  * Legacy stores (bare `postings/`, `centroids/`, `pqcents/` from
  * the pre-manifest layout) resolve as implicit snapshot v0 and are
  * migrated to the manifest on their first replacing mutation.
  */
private[graft] object IndexLayout {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Live generation count above which compaction folds non-base
    * generations into the new one. */
  val MaxGens = 4

  /** Manifests (snapshots) kept live; the previous one is the
    * reader grace window. */
  val KeepManifests = 2

  final case class Gen(dir: String, exclude: Seq[Int])

  final case class Snapshot(version: Long, centroids: String,
      pqcents: Option[String], gens: Seq[Gen])

  private[similarity] def fsOf(ss: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(ss.sessionState.newHadoopConf())

  // manifest primitives shared with the dedup stores' TableLayout —
  // one atomic-commit discipline ([[graft.ops.ManifestIo]]); the
  // index keeps its pre-existing un-prefixed manifest names
  private val ManifestPrefix = "manifest-v"

  /** The pre-manifest layout's implicit v0 snapshot, if the fixed
    * legacy dirs exist — the ONE definition both [[resolveOpt]] and
    * [[commit]]'s migration backfill share (divergent copies would
    * silently protect different things during migration). */
  private def legacySnapshot(fs: FileSystem, root: Path): Option[Snapshot] =
    if (!fs.exists(new Path(root, "postings"))) None
    else Some(Snapshot(0L, "centroids",
      Some("pqcents").filter(d => fs.exists(new Path(root, d))),
      Seq(Gen("postings", Nil))))

  /** Highest committed snapshot; `None` for a root with neither a
    * manifest nor a legacy layout (a store not yet built). */
  def resolveOpt(ss: SparkSession, path: String): Option[Snapshot] = {
    val root = new Path(path.stripSuffix("/"))
    val fs = fsOf(ss, path)
    graft.ops.ManifestIo.resolveHighest(fs, root, ManifestPrefix,
      legacySnapshot(fs, root))(parseText)
  }

  def resolve(ss: SparkSession, path: String): Snapshot =
    resolveOpt(ss, path).getOrElse(throw new IllegalStateException(
      s"no ANN index at $path: neither a manifest nor a legacy " +
        "postings directory exists — build the index first"))

  /** The version the NEXT commit will carry (names its artifact
    * directories too). Call under the store lease. */
  def nextVersion(ss: SparkSession, path: String): Long =
    resolveOpt(ss, path).map(_.version + 1L).getOrElse(1L)

  private def parseText(text: String, v: Long): Snapshot = {
    var centroids: Option[String] = None
    var pqcents: Option[String] = None
    val gens = Seq.newBuilder[Gen]
    text.split("\n").map(_.trim).filter(_.nonEmpty).foreach { line =>
      line.split("=", 2) match {
        case Array("v", _) => ()
        case Array("centroids", d) => centroids = Some(d)
        case Array("pqcents", d) => pqcents = Some(d)
        case Array("gen", spec) =>
          val parts = spec.split(";", 2)
          val excl =
            if (parts.length < 2 || parts(1).isEmpty) Seq.empty[Int]
            else parts(1).split(",").toSeq.map(_.trim.toInt)
          gens += Gen(parts(0), excl)
        case _ => throw new IllegalStateException(
          s"unparseable index manifest line: '$line'")
      }
    }
    Snapshot(v, centroids.getOrElse(throw new IllegalStateException(
      s"index manifest v$v names no centroids artifact")), pqcents,
      gens.result())
  }

  private def serialize(s: Snapshot): String = {
    val b = new StringBuilder
    b ++= s"v=${s.version}\n"
    b ++= s"centroids=${s.centroids}\n"
    s.pqcents.foreach(d => b ++= s"pqcents=$d\n")
    s.gens.foreach(g => b ++= s"gen=${g.dir};${g.exclude.sorted.mkString(",")}\n")
    b.result()
  }

  /** Atomically publish `snap` as the live snapshot. Must run under
    * the store lease; `expectEpochToken` is the committing writer's
    * [[graft.ops.StoreLock.LockCtx]] token — the epoch is re-verified
    * HERE, before the manifest lands, so a writer that lost an
    * advisory-lease race aborts with the store still on the previous
    * (winner's or prior) snapshot instead of publishing over it. */
  def commit(ss: SparkSession, path: String, snap: Snapshot,
      expectEpochToken: String): Unit = {
    val root = new Path(path.stripSuffix("/"))
    val fs = fsOf(ss, path)
    // the shared choreography ([[graft.ops.ManifestIo.commit]]):
    // epoch re-verification, legacy-v0 backfill (readers mid-scan on
    // the pre-manifest layout keep their files through the grace
    // window), atomic publish
    graft.ops.ManifestIo.commit(fs, root, ManifestPrefix, path, "index",
      snap.version, serialize(snap),
      legacySnapshot(fs, root).map(l => (0L, serialize(l))),
      expectEpochToken)
    log.info(s"committed index snapshot v${snap.version} at $path " +
      s"(${snap.gens.length} postings generation(s))")
  }

  /** Drop manifests beyond the newest [[KeepManifests]] and every
    * engine-named artifact directory no kept manifest references.
    * Runs under the store lease, right after a commit — so the grace
    * window for an in-flight reader is a FULL maintenance cycle (its
    * snapshot only dies when two further commits land). Never touches
    * `.batches`, `train.meta`, lease sidecars, or anything it did not
    * name itself. */
  def gc(ss: SparkSession, path: String,
      keepManifests: Int = KeepManifests): Unit = {
    val root = new Path(path.stripSuffix("/"))
    val fs = fsOf(ss, path)
    // engine-named artifact dirs only: versioned names, the legacy
    // fixed names (once migrated off), and pre-manifest debris
    // (aside/staging dirs a crashed old-layout writer left behind)
    val deletable = (name: String) =>
      name.matches("(postings-g|centroids-v|pqcents-v)\\d+") ||
        name == "postings" || name == "centroids" || name == "pqcents" ||
        name.startsWith(".manifest-tmp-") ||
        name.startsWith(".retrain-") ||
        name.matches("(postings|centroids|pqcents)\\.(pre-retrain|retrain-.*|compact-.*)")
    graft.ops.ManifestIo.gcKeepReferenced(fs, root, ManifestPrefix,
      keepManifests,
      (text, v) => {
        val s = parseText(text, v)
        (s.centroids +: (s.pqcents.toSeq ++ s.gens.map(_.dir))).toSet
      },
      deletable, "index"): Unit
  }

  /** Heal damage the PRE-MANIFEST compactor could leave behind: a
    * crash between its rename(live -> .cell=N.pre-compact aside) and
    * rename(fresh -> live) left the cell absent from the listing
    * while its rows sat in the hidden aside — serving silently
    * returned incomplete top-k and a re-run could not restore it.
    * On a migrated store the aside is renamed back before anything
    * counts files. New-layout compactions never create asides. */
  def healLegacyAsides(fs: FileSystem, genRoot: Path): Unit = {
    if (!fs.exists(genRoot)) return
    fs.listStatus(genRoot)
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(".cell=") &&
        s.getPath.getName.endsWith(".pre-compact"))
      .foreach { aside =>
        val cellName = aside.getPath.getName.stripPrefix(".")
          .stripSuffix(".pre-compact")
        val live = new Path(genRoot, cellName)
        if (!fs.exists(live)) {
          if (fs.rename(aside.getPath, live))
            log.warn(s"healed orphaned pre-manifest compaction aside: " +
              s"restored $cellName at $genRoot")
          else throw new IllegalStateException(
            s"could not restore orphaned compaction aside " +
              s"${aside.getPath} to $live — manual recovery required")
        } else {
          // live exists: the old crash contract's recoverable case —
          // the aside is a superseded copy, drop it
          fs.delete(aside.getPath, true)
        }
      }
  }

  /** The live postings relation of `snap`: union over generations,
    * each with its excluded cells filtered out. Filters a caller
    * adds on top (the probed-cell `isin`) push through the Union
    * into every child scan, so partition pruning is preserved per
    * generation. */
  def postingsDf(ss: SparkSession, path: String, snap: Snapshot): DataFrame = {
    import org.apache.spark.sql.functions.col
    val root = path.stripSuffix("/")
    snap.gens.map { g =>
      val df = ss.read.parquet(s"$root/${g.dir}")
      if (g.exclude.isEmpty) df
      else df.filter(!col("cell").isin(g.exclude.map(Integer.valueOf): _*))
    }.reduceLeft(_.unionByName(_))
  }

  /** Live parquet-file count per cell across `snap`'s generations —
    * the compaction pressure metric (and the spec observable). */
  def filesPerCell(ss: SparkSession, path: String,
      snap: Snapshot): Map[Int, Long] = {
    val fs = fsOf(ss, path)
    val root = path.stripSuffix("/")
    snap.gens.flatMap { g =>
      val gp = new Path(s"$root/${g.dir}")
      if (!fs.exists(gp)) Seq.empty
      else fs.listStatus(gp).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
        .flatMap { d =>
          val cell = d.getPath.getName.stripPrefix("cell=").toInt
          if (g.exclude.contains(cell)) None
          else Some(cell -> fs.listStatus(d.getPath).count(s =>
            s.isFile && s.getPath.getName.endsWith(".parquet")).toLong)
        }
    }.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).sum }
  }
}
