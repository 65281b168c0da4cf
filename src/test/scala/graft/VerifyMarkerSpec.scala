package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The `_PARTIAL_RUN` marker must be crash-safe: a full Verify run that
  * dies mid-dump leaves a directory of stale/mixed parquet — check.py
  * must refuse it, which it can only do if the marker exists for the
  * WHOLE run and is removed strictly after the last write. */
class VerifyMarkerSpec extends AnyFunSuite {

  private def tmp(): String =
    Files.createTempDirectory("graft-marker").toString

  private def marker(dir: String) = Paths.get(s"$dir/_PARTIAL_RUN")

  test("full run: marker present from start (simulated crash) until finish") {
    val dir = tmp()
    Verify.startMarker(dir, None)
    // a crash here leaves the marker -> check.py refuses the directory
    assert(Files.exists(marker(dir)))
    assert(Files.readString(marker(dir)) == "FULL_RUN_IN_PROGRESS")
    Verify.finishMarker(dir, None)
    assert(!Files.exists(marker(dir)), "completed full run must clear the marker")
  }

  test("filtered run: marker stays after finish and names the selection") {
    val dir = tmp()
    val only = Some(Set("q_b", "q_a"))
    Verify.startMarker(dir, only)
    Verify.finishMarker(dir, only)
    assert(Files.exists(marker(dir)), "a filtered dump is never a gate")
    assert(Files.readString(marker(dir)) == "q_a\nq_b")
  }

  test("full run scrubs a stale marker left by an earlier filtered run") {
    val dir = tmp()
    Verify.startMarker(dir, Some(Set("q_x")))
    // next, a full run over the same directory
    Verify.startMarker(dir, None)
    assert(Files.readString(marker(dir)) == "FULL_RUN_IN_PROGRESS")
    Verify.finishMarker(dir, None)
    assert(!Files.exists(marker(dir)))
  }
}
