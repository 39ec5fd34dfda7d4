package graft

import graft.streaming.CdcStream

/** The steady-state latency probe (ProcessingTime trigger over a
  * metered feed — the one operating mode the AvailableNow twins don't
  * exercise) must consume the whole feed, produce one progress entry
  * per metered batch, and report a coherent latency distribution.
  * A fast trigger keeps the spec quick; the bench runs the probe at
  * its real interval per state backend and publishes the numbers.
  */
class ContinuousProbeSpec extends SparkSpecBase {

  Seq("cdc_stream_apply", "stream_dedup_minhash").foreach { twin =>
    test(s"$twin consumes the metered feed under a continuous trigger") {
      val stats = CdcStream.continuousProbe(spark, sf, twin,
        triggerMs = 50, files = 24)
      assert(stats.batches >= 20,
        s"metering collapsed: ${stats.batches} data batches for 24 files")
      assert(stats.rows > 0)
      assert(stats.p50Ms <= stats.p95Ms && stats.p95Ms <= stats.maxMs)
      assert(stats.procRps > 0.0 && stats.inputRps > 0.0)
      assert(stats.stateRows > 0, "state machine never populated state")
    }
  }

  test("unknown twin rejects loudly") {
    val e = intercept[IllegalArgumentException](
      CdcStream.continuousProbe(spark, sf, "nope"))
    assert(e.getMessage.contains("no probe feed"))
  }
}
