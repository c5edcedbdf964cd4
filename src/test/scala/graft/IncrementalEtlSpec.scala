package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Rco
import graft.pipeline.RcoEtl
import graft.sources.Tables

/** T1/T2 end-to-end: an incremental run — re-extract from a lookback
  * point, recompute, windowed delete+append — must land the SAME tables
  * as one full recompute (`ref/RCO_Overall_orchestrator.R:56-76,
  * 304-317`: extraction reaches back further than the replacement
  * window precisely so sessionization/uptime context has re-converged
  * by the time rows start being replaced). */
class IncrementalEtlSpec extends GraftSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private val params = RcoEtl.SiteParams(
    server = "T1T2",
    coPredicateSql = Rco.testCoPredicate,
    machineLevel = false,
    firstStop = false)

  private def co(dir: String): Set[String] =
    spark.read.parquet(s"$dir/CO_Aggregated_Data")
      .select(col("CO_Identifier"), col("LINE"),
        // doubles are summed under different partitionings in the two
        // paths — compare at a tolerance well above FP fold drift
        round(col("CO_DOWNTIME"), 6).as("d"),
        round(col("Total_Uptime_till_Next_CO"), 6).as("u"),
        col("Current_BRANDCODE"), col("Next_BRANDCODE"))
      .collect().map(_.mkString("|")).toSet

  private def rt(dir: String): Set[String] =
    spark.read.parquet(s"$dir/Runtime_per_Day_data")
      .select(col("Date"), col("LINE"), round(col("Runtime"), 3).as("r"))
      .collect().map(_.mkString("|")).toSet

  test("lookback re-extract + windowed upsert equals a full recompute") {
    // pin, not a raw persist: RcoPipeline's spine memo may already
    // hold this exact plan from an earlier suite in the shared
    // session, and pin's cache lookup absorbs that instead of
    // WARN-ing the CacheManager (VERDICT r12 #6)
    val full = graft.operators.CacheScope.pin(
      Rco.downtimeLogDeduped(Tables.events(spark, sfDir)))
    val prod = Rco.productionLog(Tables.events(spark, sfDir))
    val Array(tMin, tMax) = full.agg(min("START_EPOCH"), max("START_EPOCH"))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    def at(f: Double) = tMin + (tMax - tMin) * f
    // batch 1 extracts [0, 70%); batch 2 re-extracts from 40% (lookback)
    // and replaces stored rows from 55% on — both margins are far wider
    // than any session/uptime context, mirroring the reference's
    // lookback ≫ replacement-window layout
    val t1 = at(0.40); val tLoad = at(0.55); val t2 = at(0.70)

    val dirFull = Files.createTempDirectory("graft-t2-full").toString
    val dirInc = Files.createTempDirectory("graft-t2-inc").toString

    RcoEtl.load(spark, RcoEtl.run(full, prod, params), dirFull, params.server)

    // batch 1 stamps its extraction horizon (t2) as Data_Update_Time —
    // the T1 watermark the reference's next run reads back
    val batch1 = full.filter(col("START_EPOCH") < t2)
    RcoEtl.load(spark, RcoEtl.run(batch1, prod, params), dirInc,
      params.server,
      updateTime = Some(new java.sql.Timestamp((t2 * 1000).toLong)))

    // The ROUND-TRIP: batch 2's extraction start comes from the STORED
    // watermark (ref/RCO_Overall_orchestrator.R:68-72), not a constant —
    // watermark minus the lookback span, exactly the reference rule.
    val wm = graft.sources.ConfigOps
      .scriptDataWatermark(spark, dirInc, params.server)
      .getOrElse(fail("watermark must be stored by the first load"))
    val wmEpoch = wm.getTime / 1000.0
    assert(math.abs(wmEpoch - t2) < 1.0,
      "stored watermark should be batch 1's horizon")
    val lookbackSec = t2 - t1 + 1.0 // +1s absorbs the ms truncation
    val batch2 = full.filter(col("START_EPOCH") >= wmEpoch - lookbackSec)
    val out2 = RcoEtl.run(batch2, prod, params)
      // the reference loads only rows inside the replacement window;
      // rows before it (boundary-damaged context) are discarded
      .map { case (k, df) =>
        k -> (if (k == "CO_Aggregated_Data")
          df.filter(col("CO_Start_EPOCH") >= tLoad) else df)
      }
    RcoEtl.load(spark, out2, dirInc, params.server)

    assert(co(dirInc) == co(dirFull),
      "CO_Aggregated_Data must converge to the full recompute")
    assert(rt(dirInc) == rt(dirFull),
      "Runtime_per_Day_data must converge to the full recompute")
    full.unpersist()
  }
}
