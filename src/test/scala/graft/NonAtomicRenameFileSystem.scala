package graft

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** Test shim: the local filesystem wearing a scheme (`nonatomic://`)
  * that [[graft.streaming.FsCommit]] does NOT trust to rename
  * atomically — the stand-in for S3A/GCS in the compaction guard
  * drills. Functionally every operation is plain local IO (so the
  * opt-in branch of the drill can run the full protocol through it);
  * what the drills exercise is the SCHEME-based refusal and that it
  * fires before any destructive step.
  *
  * Registered per-test via `fs.nonatomic.impl` on the session's Hadoop
  * conf (with `fs.nonatomic.impl.disable.cache=true` so conf changes
  * take effect between tests).
  */
class NonAtomicRenameFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "nonatomic"
  override def getUri: URI = URI.create("nonatomic:///")
}
