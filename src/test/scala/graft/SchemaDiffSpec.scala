package graft

import graft.operators.SchemaDiff
import graft.operators.SchemaDiff._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Field-level schema drift: adds/removes/type/nullability, recursing
  * into structs and array elements with dotted paths. */
class SchemaDiffSpec extends AnyFunSuite {

  val v1 = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("meta", StructType(Seq(
      StructField("src", StringType),
      StructField("v", IntegerType)))),
    StructField("tags", ArrayType(StructType(Seq(
      StructField("k", StringType)))))))

  val v2 = StructType(Seq(
    StructField("id", LongType, nullable = true),     // nullability
    StructField("name", IntegerType),                 // type change
    StructField("meta", StructType(Seq(
      StructField("src", StringType),
      StructField("v", LongType),                     // nested type
      StructField("region", StringType)))),           // nested add
    StructField("tags", ArrayType(StructType(Seq(
      StructField("k", StringType),
      StructField("w", DoubleType))))),               // array-elem add
    StructField("score", DoubleType)))                // top-level add

  test("diff reports adds, removes, type and nullability changes with" +
      " dotted nested paths") {
    val changes = SchemaDiff.diff(v1, v2)
    val byPath = changes.groupBy(_.path)
    assert(byPath("score").head.kind == Added)
    assert(byPath("name").head == FieldChange("name", TypeChanged,
      Some("string"), Some("int")))
    assert(byPath("id").head.kind == NullabilityChanged)
    assert(byPath("meta.v").head == FieldChange("meta.v", TypeChanged,
      Some("int"), Some("bigint")))
    assert(byPath("meta.region").head.kind == Added)
    assert(byPath("tags[].w").head.kind == Added)
    assert(changes.size == 6)
    // reverse direction: the add becomes a remove
    assert(SchemaDiff.diff(v2, v1).exists(c =>
      c.path == "score" && c.kind == Removed))
  }

  test("isAdditive accepts pure column additions and rejects the rest") {
    val widened = StructType(v1.fields :+ StructField("extra", StringType))
    assert(SchemaDiff.isAdditive(v1, widened))
    assert(!SchemaDiff.isAdditive(v1, v2))
    assert(SchemaDiff.diff(v1, v1).isEmpty)
  }
}
