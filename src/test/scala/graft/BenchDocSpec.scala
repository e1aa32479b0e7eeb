package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.RenderBenchDoc

/** BENCH.md is a rendered artifact: any drift between the doc and the
  * checked-in bench JSONs fails the build (rounds 1 and 2 both shipped
  * hand-edited numbers that did not match the shipped JSONs). */
class BenchDocSpec extends AnyFunSuite {

  private val dir = sys.props.getOrElse("user.dir", ".")

  test("BENCH.md matches a fresh render of the bench JSON artifacts") {
    val doc = Paths.get(dir, "BENCH.md")
    assume(Files.exists(doc), "no BENCH.md in working directory")
    val onDisk = new String(Files.readAllBytes(doc), "UTF-8")
    assert(onDisk == RenderBenchDoc.render(dir),
      "BENCH.md drifted from the bench JSONs — rerun graft.tools.RenderBenchDoc")
  }

  test("every driver bench artifact parses to a stage table") {
    RenderBenchDoc.artifacts(dir).foreach { case (name, j) =>
      assert(RenderBenchDoc.queryTimes(j).nonEmpty, s"$name: no stage times")
      assert(RenderBenchDoc.num(j, "value").nonEmpty, s"$name: no total")
    }
  }
}
