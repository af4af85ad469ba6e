package graft.sync

import graft.SparkSpec

class FileStateSyncSpec extends SparkSpec {
  import spark.implicits._

  test("reconcile covers all decision branches") {
    val listing = Seq(
      ("new.csv", 100L),
      ("changed.csv", 200L),
      ("errored.csv", 50L),
      ("stable.csv", 10L)
    ).toDF("file_name", "last_modified")
    val state = Seq(
      ("changed.csv", 150L, FileStateSync.StatusDone),
      ("errored.csv", 50L, "Error: boom"),
      ("stable.csv", 10L, FileStateSync.StatusDone),
      ("vanished.csv", 5L, "Error: gone")
    ).toDF("file_name", "last_modified", "status")
    val out = FileStateSync
      .reconcile(listing, state)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(out("new.csv") == ((100L, FileStateSync.StatusNew)))
    assert(out("changed.csv") == ((200L, FileStateSync.StatusUpdate))) // newer last_modified
    assert(out("errored.csv") == ((50L, FileStateSync.StatusUpdate))) // quarantine retry
    assert(out("stable.csv") == ((10L, FileStateSync.StatusDone)))
    assert(out("vanished.csv") == ((5L, "Error: gone"))) // history kept
  }

  test("force_reload resets every listed file and drops vanished history") {
    val listing = Seq(
      ("changed.csv", 200L),
      ("errored.csv", 50L),
      ("stable.csv", 10L)
    ).toDF("file_name", "last_modified")
    val state = Seq(
      ("changed.csv", 150L, FileStateSync.StatusDone),
      ("errored.csv", 50L, "Error: boom"),
      ("stable.csv", 10L, FileStateSync.StatusDone),
      ("vanished.csv", 5L, "Error: gone")
    ).toDF("file_name", "last_modified", "status")
    val out = FileStateSync
      .reconcile(listing, state, forceReload = true)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    // the reference truncates the logging table: every listed file is
    // new again (listing's last_modified, not the stale state's) and
    // unlisted history is gone
    assert(out.keySet == Set("changed.csv", "errored.csv", "stable.csv"))
    assert(out.values.forall(_._2 == FileStateSync.StatusNew))
    assert(out("changed.csv")._1 == 200L)
    // forceReload = false must stay byte-identical to the 2-arg form
    val plain = FileStateSync.reconcile(listing, state, forceReload = false)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    val twoArg = FileStateSync.reconcile(listing, state)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(plain.toSeq == twoArg.toSeq)
  }
}
