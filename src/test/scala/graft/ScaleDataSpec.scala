package graft

import graft.datagen.ScaleData
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The scale-corpus generation-marker protocol: a dir is reusable only
  * when its `_gen` marker matches the generator shape that would
  * produce it — a generator change (or a crash mid-generation, which
  * leaves no marker) regenerates instead of silently serving a stale
  * corpus under the new description (the round-11 SCALE_STRESS
  * cross-corpus lesson). */
class ScaleDataSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ensure() is idempotent under a matching marker, regenerates " +
      "on marker mismatch or absence, and writes the marker LAST") {
    val dir = Files.createTempDirectory("graft_scaledata").toString
    ScaleData.ensure(spark, dir, 1)
    val gen = Paths.get(s"$dir/_gen")
    assert(Files.exists(gen), "generation marker written")
    val marker = new String(Files.readAllBytes(gen), "UTF-8")
    assert(marker.contains("mult=1") && marker.contains("variants="),
      marker)
    def docsMtime() = Files.getLastModifiedTime(
      Paths.get(s"$dir/documents.parquet/_SUCCESS")).toMillis
    val t1 = docsMtime()
    // same generator shape → reuse, no regeneration
    ScaleData.ensure(spark, dir, 1)
    assert(docsMtime() == t1, "matching marker must reuse the corpus")
    // a marker from a DIFFERENT generator shape → regenerate
    Files.write(gen, "scaledata-v1:mult=1:variants=9".getBytes("UTF-8"))
    ScaleData.ensure(spark, dir, 1)
    assert(docsMtime() > t1, "stale marker must force regeneration")
    assert(new String(Files.readAllBytes(gen), "UTF-8") == marker,
      "regeneration restores the current generator's marker")
    // crash-mid-generation shape: data present, marker gone → regenerate
    val t2 = docsMtime()
    Files.delete(gen)
    ScaleData.ensure(spark, dir, 1)
    assert(docsMtime() > t2,
      "a markerless (crashed) corpus must regenerate")
    assert(Files.exists(gen))
    // fixedVocab is a DIFFERENT generator shape than the Heaps default
    val fixedMarker = {
      val d2 = Files.createTempDirectory("graft_scaledata_f").toString
      ScaleData.ensure(spark, d2, 1, fixedVocab = true)
      new String(Files.readAllBytes(Paths.get(s"$d2/_gen")), "UTF-8")
    }
    assert(fixedMarker.contains("variants=1") && fixedMarker != marker)
  }
}
