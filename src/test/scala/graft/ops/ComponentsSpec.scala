package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Connected components (the dedup transitive-closure primitive):
  * correctness on known graphs, log-round convergence on a long chain,
  * and equivalence to a brute-force closure on a random graph. */
class ComponentsSpec extends SparkTestBase {

  import spark.implicits._

  private def run(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = (0L until n).toDF("id")
    val e = edges.toDF("src", "dst")
    Components.connected(nodes, e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chains, pairs, and singletons collapse to the component min") {
    // components: {0,1,2} chain, {5,6} pair, {3},{4} singletons
    val got = run(7, Seq((1L, 0L), (1L, 2L), (6L, 5L)))
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L,
      4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("a 64-node chain converges within the pointer-jumping bound") {
    // diameter 63: pure one-hop propagation would need >30 rounds, so
    // finishing under maxRounds=30 proves path compression is working
    val got = run(64, (0L until 63L).map(i => (i, i + 1)))
    assert(got.values.toSet === Set(0L))
  }

  test("matches a brute-force closure on a random graph") {
    val rnd = new scala.util.Random(42)
    val n = 60
    val edges = Seq.fill(45)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // brute force: Floyd–Warshall-style reachability on the driver
    val adj = Array.fill(n)(collection.mutable.Set.empty[Int])
    edges.foreach { case (a, b) =>
      adj(a.toInt) += b.toInt; adj(b.toInt) += a.toInt
    }
    val expect = Array.tabulate(n) { i =>
      val seen = collection.mutable.Set(i)
      val queue = collection.mutable.Queue(i)
      while (queue.nonEmpty)
        adj(queue.dequeue()).foreach { j =>
          if (!seen(j)) { seen += j; queue += j }
        }
      seen.min.toLong
    }
    val got = run(n, edges)
    assert((0 until n).forall(i => got(i.toLong) == expect(i)))
  }

  test("empty edge list leaves every node its own component") {
    val got = run(5, Seq.empty)
    assert(got === (0L until 5L).map(i => i -> i).toMap)
  }

  test("reliable checkpoints reap superseded rounds, keep the fixpoint") {
    // with a checkpoint dir set the loop must (a) still converge, and
    // (b) delete each round's files once the next round materializes —
    // exactly ONE rdd-* dir (the returned fixpoint's) may survive
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val got = run(16, (0L until 15L).map(i => (i, i + 1)))
      assert(got.values.toSet === Set(0L))
      val rddDirs = java.nio.file.Files.walk(dir).iterator().asScala
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("rdd-"))
        .toList
      assert(rddDirs.size === 1,
        s"superseded checkpoint dirs not reaped: $rddDirs")
    } finally {
      // Option(null).map → None: resets the context to no-checkpoint-dir
      // so later suites keep exercising the localCheckpoint path
      spark.sparkContext.setCheckpointDir(null)
    }
  }
}
