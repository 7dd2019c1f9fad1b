package graft.operators

import org.apache.spark.sql.DataFrame

/** Memo key for a file-backed frame — the identity that makes warm-engine
  * memoization SAFE: every leaf's parquet/csv root paths AND the
  * file-index snapshot (each file's path, length, modification time —
  * hashed), plus the canonicalized plan tree (exprIds normalized, so two
  * independent reads of the same path produce the SAME key, while any
  * differing filter/projection above the scan produces a different one).
  * The snapshot component means a corpus that GREW under the same path —
  * the daily-append shape — keys differently, so a memoized relation or
  * trained artifact can never silently serve stale data: reuse is an
  * optimization, never a semantics change. None if any leaf is not a file
  * relation — those frames carry no stable identity, so they are never
  * memoized. Shared by the dedup chains (Dedup) and the ANN trainers
  * (Similarity). */
private[operators] object SnapshotKey {
  def of(df: DataFrame): Option[String] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val plan = df.queryExecution.analyzed
    val leaves = plan.collectLeaves().map {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation =>
          // listFiles over the already-built in-memory file index — a
          // driver-side map lookup, no filesystem round-trip per call
          val listing = h.location.listFiles(Nil, Nil).flatMap(_.files)
            .map(f => s"${f.getPath}#${f.getLen}#${f.getModificationTime}")
            .sorted.mkString("\n")
          val digest = java.security.MessageDigest.getInstance("MD5")
            .digest(listing.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            .map("%02x".format(_)).mkString
          Some(h.location.rootPaths.mkString(",") + "@" + digest)
        case _ => None
      }
      case _ => None
    }
    if (leaves.nonEmpty && leaves.forall(_.isDefined))
      // HadoopFsRelation.toString omits paths, hence the explicit leaf list
      Some(leaves.flatten.mkString(";") + "|" + plan.canonicalized.toString)
    else None
  }
}
