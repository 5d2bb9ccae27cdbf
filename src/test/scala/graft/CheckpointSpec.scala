package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{bpe, dedup, graph}

/** The reliable-vs-local checkpoint law ([[graft.ops.ckpt]]): every
  * iterative op must produce IDENTICAL results whether lineage is cut
  * with `localCheckpoint` (no checkpoint dir — the single-node default)
  * or a reliable `checkpoint()` (dir set — the cluster/fault-tolerant
  * path). The reliable path must actually write to the directory, or
  * the durability claim is vacuous. */
class CheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def withCheckpointDir[A](body: => A): A = {
    val dir = Files.createTempDirectory("graft-ckpt-").toString
    spark.sparkContext.setCheckpointDir(dir)
    try body
    finally {
      // Option(null) => None: restores the local-checkpoint default for
      // every suite sharing this session.
      spark.sparkContext.setCheckpointDir(null)
      assert(
        Files.list(java.nio.file.Paths.get(dir)).findAny().isPresent,
        "reliable path never wrote a checkpoint")
    }
  }

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("pageRank: reliable checkpoints reproduce the local-path ranks") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L), (5L, 1L)
    ).toDF("src", "dst")
    val local = graph.pageRank(edges, iters = 4).orderBy("id")
      .as[(Long, Long)].collect().toSeq
    val reliable = withCheckpointDir {
      graph.pageRank(edges, iters = 4).orderBy("id")
        .as[(Long, Long)].collect().toSeq
    }
    assert(reliable == local)
    assert(local.map(_._2).distinct.size > 1) // non-degenerate fixture
  }

  test("connectedComponents: reliable checkpoints reproduce the local-path reps") {
    // driverFinishEdges = 0 forces the distributed fixpoint (the path
    // that actually iterates and checkpoints per round).
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (7L, 8L), (9L, 7L), (20L, 21L)
    ).toDF("id_a", "id_b")
    val local = dedup.connectedComponents(pairs, driverFinishEdges = 0L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val reliable = withCheckpointDir {
      dedup.connectedComponents(pairs, driverFinishEdges = 0L)
        .orderBy("id").as[(Long, Long)].collect().toSeq
    }
    assert(reliable == local)
    assert(local == Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L),
      (9L, 7L), (20L, 20L), (21L, 20L)))
  }

  test("bpe.train: reliable checkpoints reproduce the local-path merges") {
    val sample = docs.limit(80)
    val local = bpe.train(sample, "text", merges = 5, minPairCount = 2)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    val reliable = withCheckpointDir {
      bpe.train(sample, "text", merges = 5, minPairCount = 2)
        .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    }
    assert(reliable == local)
    assert(local.size == 5)
  }
}
