package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental batch ingest — the batch rendering of the filelog
  * receiver's fingerprint + offset resume (`pkg/stanza/fileconsumer/
  * internal/reader/reader.go:22-28`, `internal/checkpoint/checkpoint.go:
  * 20-94` in `/root/reference`).
  *
  * The streaming mode gets this for free from Structured Streaming's
  * file-source offsets; in batch mode each run should process only the
  * table files that appeared since the last committed run. The unit of
  * ingest is a whole immutable data file (parquet files never grow in
  * place), so the fingerprint is `path|length` — the analog of the
  * reference's head-bytes fingerprint for append-only logs.
  *
  * Protocol (all object-store-safe, no appends):
  *   1. [[plan]] lists the table, subtracts the fingerprints already in
  *      the manifest, and returns the new files.
  *   2. The caller processes ONLY those files and writes its outputs
  *      idempotently (overwrite-by-partition / [[graft.run.Lineage]]).
  *   3. The caller invokes `commit()`, which atomically replaces the
  *      manifest (write temp + rename) with old ∪ new.
  * A crash between 2 and 3 re-processes the same new files next run —
  * exactly-once at the sink via the idempotent write, at-least-once at
  * the source, the same contract as the reference's checkpointing.
  */
object Incremental {

  final case class Plan(newFiles: Seq[String], commit: () => Unit) {
    def isEmpty: Boolean = newFiles.isEmpty
  }

  private def manifestPath(ckptDir: String) = new Path(ckptDir, "ingest_manifest.list")

  /** List table data files not yet committed; `commit()` marks them done. */
  def plan(spark: SparkSession, tablePath: String, ckptDir: String,
           suffix: String = ".parquet"): Plan = {
    val conf = spark.sessionState.newHadoopConf()
    val table = new Path(tablePath)
    val fs = table.getFileSystem(conf)
    // RECURSIVE listing (partitioned layouts like route=*/part-*.parquet
    // are data files too) and FULL-URI fingerprints: toUri.getPath would
    // strip scheme/authority, so s3a://bucket/x and hdfs://nn/x would
    // collide and readNew would re-resolve them against the default FS
    // consumer deployed before the producer's first run: a missing
    // table dir is "nothing new yet", not a crash (the fs.exists → Nil
    // discipline fileLineage already follows)
    val current =
      if (!fs.exists(table)) Seq.empty[String]
      else {
        val it = fs.listFiles(table, true)
        val buf = Seq.newBuilder[String]
        while (it.hasNext) {
          val f = it.next()
          if (f.isFile && f.getPath.getName.endsWith(suffix))
            buf += s"${escapePath(f.getPath.toString)}|${f.getLen}"
        }
        buf.result().sorted
      }
    val mp = manifestPath(ckptDir)
    val mfs = mp.getFileSystem(conf)
    val seen: Set[String] =
      if (mfs.exists(mp)) {
        val in = mfs.open(mp)
        try new String(in.readAllBytes(), StandardCharsets.UTF_8)
          .split("\n").filter(_.nonEmpty).toSet
        finally in.close()
      } else Set.empty
    val fresh = current.filterNot(seen)
    val currentSet = current.toSet
    Plan(fresh, () =>
      // atomic replace via the shared temp+overwriting-rename writer
      // (one implementation with the lineage manifests). The manifest
      // is PRUNED to fingerprints still present in the table: without
      // it, retention/compaction makes the manifest grow O(history)
      // forever and every run reads+rewrites dead entries. Cost of the
      // prune: a deleted-then-resurrected identical path re-ingests —
      // the at-least-once side of the contract, resolved by the
      // idempotent sink like any crash replay.
      graft.run.Lineage.writeAtomic(mp,
        (seen.filter(currentSet) ++ fresh).toSeq.sorted.mkString("\n"), conf))
  }

  // a legal POSIX/HDFS file name may contain '\n' (and '%'): the
  // manifest is newline-separated, so an unescaped path would split
  // into bogus entries that never match and re-ingest forever.
  // MIGRATION NOTE (ADVICE r5): manifests written BEFORE escaping was
  // introduced store paths containing '%' unescaped; on upgrade those
  // entries no longer match their re-escaped fingerprints (and the
  // prune drops them), so such files re-ingest ONCE — the at-least-once
  // side of the contract, absorbed by the idempotent sink like any
  // crash replay. Paths without '%' (the overwhelming case) are
  // byte-identical under escaping and unaffected.
  private def escapePath(p: String): String =
    p.replace("%", "%25").replace("\n", "%0A")
  private def unescapePath(p: String): String =
    p.replace("%0A", "\n").replace("%25", "%")

  /** Read just the not-yet-committed files of a parquet table (empty
    * DataFrame with the table's schema when nothing is new).
    *
    * `fallbackSchema` is the shape of the empty frame when the table
    * directory does not exist yet (consumer-before-producer): schema
    * inference has nothing to read there, so the promised
    * "empty DataFrame with the table's schema" contract can only be
    * honored by the caller naming the schema. Defaults to the
    * transcript input_hint shape (the StreamingJob discipline) — a
    * non-transcript table's consumer passes its own (r6, ADVICE r5:
    * the hard-coded transcript fallback silently mis-shaped generic
    * tables' empty frames). */
  def readNew(spark: SparkSession, tablePath: String, ckptDir: String,
              fallbackSchema: org.apache.spark.sql.types.StructType =
                Transcripts.transcriptSchema): (DataFrame, Plan) = {
    val p = plan(spark, tablePath, ckptDir)
    val df =
      if (p.isEmpty)
        // a table dir that is missing or has no data files yet makes
        // schema inference throw — the consumer-before-producer case
        // must yield the promised empty frame, in the caller's shape
        try spark.read.parquet(tablePath).limit(0)
        catch { case _: org.apache.spark.sql.AnalysisException =>
          spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
            fallbackSchema) }
      // basePath: reading explicit leaf files of a PARTITIONED table
      // (route=X/part-N.parquet) must keep the partition columns the
      // empty-plan branch's whole-table read carries — without it the
      // partition values vanish and the two branches disagree on schema
      // the length is the LAST '|'-separated segment — split at the
      // last bar, not the first: a legal file name may itself contain
      // '|' and a first-bar split would truncate the path
      else spark.read.option("basePath", tablePath)
        .parquet(p.newFiles.map(f =>
          unescapePath(f.substring(0, f.lastIndexOf('|')))): _*)
    (df, p)
  }
}
