package graft

import org.apache.spark.sql.functions._

import graft.queries.QueryGroup
import graft.streaming.VersionedStore

/** Time travel over the versioned keyed store
  * ([[graft.streaming.VersionedStore]]): commit/versions bookkeeping,
  * per-version reconstruction, tombstones, revival after delete, and
  * checkpoint transparency (same answers, shorter replay). */
class VersionedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def ch(rows: (Long, String, String)*) =
    rows.toSeq.toDF("k", "val", VersionedStore.OpCol)

  test("snapshotAt reconstructs every version; deletes tombstone; updates revive") {
    val path = QueryGroup.scratchDir("graft-vstore")
    assert(VersionedStore.commit(spark, path,
      ch((1L, "a1", "u"), (2L, "b1", "u"), (3L, "c1", "u"))) === 1L)
    assert(VersionedStore.commit(spark, path,
      ch((2L, "b2", "u"), (3L, "c1", "d"))) === 2L)
    assert(VersionedStore.commit(spark, path,
      ch((3L, "c3", "u"), (1L, "a1", "d"), (4L, "d3", "u"))) === 3L)
    assert(VersionedStore.versions(spark, path) === Seq(1L, 2L, 3L))

    def at(v: Long) = VersionedStore.snapshotAt(spark, path, v, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(at(1L) === Set((1L, "a1"), (2L, "b1"), (3L, "c1")))
    assert(at(2L) === Set((1L, "a1"), (2L, "b2")))           // 3 tombstoned
    assert(at(3L) === Set((2L, "b2"), (3L, "c3"), (4L, "d3"))) // 3 revived, 1 dropped

    // a checkpoint changes replay cost, never answers
    VersionedStore.checkpoint(spark, path, 2L, Seq("k"))
    assert(at(2L) === Set((1L, "a1"), (2L, "b2")))
    assert(at(3L) === Set((2L, "b2"), (3L, "c3"), (4L, "d3")))

    // post-checkpoint commits read checkpoint + delta only
    VersionedStore.commit(spark, path, ch((4L, "d4", "u")))
    assert(at(4L) === Set((2L, "b2"), (3L, "c3"), (4L, "d4")))
  }

  test("commit refuses a changelog without the op column") {
    val path = QueryGroup.scratchDir("graft-vstore-noop")
    val e = intercept[IllegalArgumentException] {
      VersionedStore.commit(spark, path, Seq((1L, "x")).toDF("k", "val"))
    }
    assert(e.getMessage.contains(VersionedStore.OpCol))
  }

  test("snapshotAt refuses unknown versions") {
    val path = QueryGroup.scratchDir("graft-vstore-badv")
    VersionedStore.commit(spark, path, ch((1L, "a", "u")))
    val e = intercept[IllegalArgumentException] {
      VersionedStore.snapshotAt(spark, path, 9L, Seq("k"))
    }
    assert(e.getMessage.contains("not committed"))
  }
}
