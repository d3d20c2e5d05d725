package graft

import graft.trace.{TracePipeline => TP}
import org.scalatest.funsuite.AnyFunSuite

/** Part-1 conservation invariants over the reference's remaining
  * committed datasets (simple / variety / complexity — the ones with no
  * golden output files): whatever the grouping decides, it must
  * PARTITION the process set, and the dedup'd log must carry exactly
  * one representative stream per group. Catches pipeline crashes or
  * dropped processes on the reference's own data variants, not just
  * the two golden-verified files. */
class ReferenceDataSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  for (name <- Seq("simple", "variety", "complexity"))
    test(s"part1 partitions and dedups $name.json") {
      val logs = TP.readLogJson(spark, s"/root/reference/Data/$name.json")
      val allProcs = logs.select("process_id").distinct()
        .collect().map(_.getString(0)).toSet
      assert(allProcs.nonEmpty, s"$name.json parsed no processes")
      val (groups, dedup) = TP.part1(spark, logs)
      val memberLists = groups.collect()
        .map(_.getAs[scala.collection.Seq[String]]("equal_processes").toList)
      // every process in exactly one group — a partition, no drops,
      // no double-membership
      val flat = memberLists.flatten
      assert(flat.size == flat.distinct.size,
        s"$name: a process appears in two groups")
      assert(flat.toSet == allProcs,
        s"$name: grouped ${flat.size} of ${allProcs.size} processes")
      // the dedup'd log carries exactly the group representatives
      val gids = groups.collect()
        .map(_.getAs[Long]("group_processes_id")).toSet
      val dedupGids = dedup.select("process_id").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(dedupGids == gids,
        s"$name: dedup log groups $dedupGids != $gids")
    }
}
