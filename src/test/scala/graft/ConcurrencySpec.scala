package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import graft.ops.Cluster
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Concurrent-execution spec for the shared-session hazards the code
  * documents: two star-contraction CC runs in ONE SparkSession at the
  * same time. This is exactly the round-8 ADVICE scenario behind the
  * per-call unique `observe()` names in `ccLargeSmallStar` — Spark's
  * Observation listener matches executions by METRIC NAME, so two
  * concurrent runs sharing a round index with non-unique names could
  * cross-read each other's per-round signatures (wrong convergence
  * detection) or deadlock `obs.get`. The spec runs the two graphs
  * concurrently several times and asserts each result equals its own
  * sequential baseline, component-for-component.
  */
class ConcurrencySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Path graph a: 0-1-2-...-29 plus isolated pairs; graph b: a single
    * dense 12-vertex clique (keys i*7). Different shapes → different
    * round counts, so the concurrent runs' per-round observation
    * indices interleave. */
  private def graphA = {
    import spark.implicits._
    ((0L until 29L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (102L, 103L), (104L, 105L)))
      .toDF("l1", "l2")
  }
  private def graphB = {
    import spark.implicits._
    (for { i <- 0L until 12L; j <- (i + 1) until 12L } yield
      (i * 7, j * 7)).toDF("l1", "l2")
  }

  private def components(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two concurrent ccLargeSmallStar runs in one session stay " +
    "isolated (unique observation names)") {
    val baseA = components(Cluster.ccLargeSmallStar(graphA)._1
      .select(col("v"), col("component")))
    val baseB = components(Cluster.ccLargeSmallStar(graphB)._1
      .select(col("v"), col("component")))
    Caches.drain()
    (1 to 3).foreach { round =>
      val fa = Future(components(Cluster.ccLargeSmallStar(graphA)._1
        .select(col("v"), col("component"))))
      val fb = Future(components(Cluster.ccLargeSmallStar(graphB)._1
        .select(col("v"), col("component"))))
      val (ra, rb) = (Await.result(fa, 5.minutes),
        Await.result(fb, 5.minutes))
      assert(ra == baseA,
        s"round $round: concurrent A diverged from sequential baseline")
      assert(rb == baseB,
        s"round $round: concurrent B diverged from sequential baseline")
      Caches.drain()
    }
  }
}
