package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Tune

/** Input-derived shuffle parallelism: the measured 5M-doc sizing rule
  * (BASELINE.md round-9 postmortem) as checked policy.
  */
class TuneSpec extends AnyFunSuite {

  test("derived counts reproduce the measured decade points") {
    val exp = Tune.PpjoinShuffleExpansion
    // sf0.1 documents (0.6 MB) and the 100x replica (87 MB): both sit
    // under the floor at local[32] — small points keep the decade
    // ratios comparable, exactly as the manual knob did
    assert(Tune.shufflePartitions(594568L, exp, floor = 32) === 32)
    assert(Tune.shufflePartitions(86837458L, exp, floor = 32) === 32)
    // the 1000x point (0.93 GB parquet -> ~68 GB shuffle): ~260
    // partitions of ~256 MB — the hung-job regime (32 x >2 GB) is
    // un-enterable under the derived default
    val p5m = Tune.shufflePartitions(928602216L, exp, floor = 32)
    assert(p5m >= 256 && p5m <= 280, s"5M-doc point derived $p5m")
  }

  test("monotonic in input, floored, capped, overflow-safe") {
    val a = Tune.shufflePartitions(1L << 30, 75.0, floor = 32)
    val b = Tune.shufflePartitions(1L << 33, 75.0, floor = 32)
    assert(b >= a)
    assert(Tune.shufflePartitions(0L, 75.0, floor = 16) === 16)
    // 100 TB at 75x expansion: capped, not Int-overflowed or negative
    val huge = Tune.shufflePartitions(100L << 40, 75.0, floor = 32)
    assert(huge === 1000000)
    intercept[IllegalArgumentException] {
      Tune.shufflePartitions(-1L, 75.0, floor = 32)
    }
  }

  test("parquetBytes sums part files, skips markers, 0 for missing") {
    val dir = java.nio.file.Files.createTempDirectory("tune_spec").toFile
    try {
      java.nio.file.Files.write(dir.toPath.resolve("part-0.parquet"),
        Array.fill[Byte](100)(1))
      java.nio.file.Files.write(dir.toPath.resolve("_SUCCESS"),
        Array.fill[Byte](9)(1))
      assert(Tune.parquetBytes(dir.getAbsolutePath) === 100L)
      assert(Tune.parquetBytes(dir.getAbsolutePath + "/nope") === 0L)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
