package graft.operators

import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Schema drift report: the operational companion to Incremental's
  * `append_new_columns` evolution — before (or after) an upsert, diff
  * the incoming batch's schema against the target's and get a
  * field-level account of what changed, recursing into nested structs
  * and array elements with dotted paths. Pure metadata work (no jobs);
  * at 100 TB this is what a pipeline logs/alerts on when a producer
  * ships a v3 schema.
  */
object SchemaDiff {

  sealed trait Kind
  case object Added extends Kind
  case object Removed extends Kind
  case object TypeChanged extends Kind
  case object NullabilityChanged extends Kind

  final case class FieldChange(path: String, kind: Kind,
                               from: Option[String], to: Option[String])

  /** Changes that turn `old` into `newer`. Field order is ignored
    * (parquet resolves by name); within-struct report order follows
    * `newer` for added/changed and `old` for removed. */
  def diff(old: StructType, newer: StructType,
           prefix: String = ""): Seq[FieldChange] = {
    val oldByName = old.fields.map(f => f.name -> f).toMap
    val newByName = newer.fields.map(f => f.name -> f).toMap
    val added = newer.fields.filterNot(f => oldByName.contains(f.name))
      .map(f => FieldChange(prefix + f.name, Added, None,
        Some(f.dataType.simpleString)))
    val removed = old.fields.filterNot(f => newByName.contains(f.name))
      .map(f => FieldChange(prefix + f.name, Removed,
        Some(f.dataType.simpleString), None))
    val common = newer.fields.filter(f => oldByName.contains(f.name))
      .flatMap { nf =>
        val of = oldByName(nf.name)
        val path = prefix + nf.name
        val typeChanges = (of.dataType, nf.dataType) match {
          case (o: StructType, n: StructType) => diff(o, n, path + ".")
          case (ArrayType(o: StructType, _), ArrayType(n: StructType, _)) =>
            diff(o, n, path + "[].")
          case (o, n) if o != n =>
            Seq(FieldChange(path, TypeChanged,
              Some(o.simpleString), Some(n.simpleString)))
          case _ => Nil
        }
        val nullChange =
          if (sameShape(of.dataType, nf.dataType) &&
              of.nullable != nf.nullable)
            Seq(FieldChange(path, NullabilityChanged,
              Some(of.nullable.toString), Some(nf.nullable.toString)))
          else Nil
        typeChanges ++ nullChange
      }
    added.toSeq ++ removed.toSeq ++ common.toSeq
  }

  /** True when only nested-struct internals (not the top-level shape)
    * could differ — nullability is then comparable. */
  private def sameShape(a: DataType, b: DataType): Boolean = (a, b) match {
    case (_: StructType, _: StructType) => true
    case _ => a == b
  }

  /** Convenience gate: does `newer` only ADD columns relative to `old`
    * (the shape `Incremental.upsert` evolves through losslessly)? */
  def isAdditive(old: StructType, newer: StructType): Boolean =
    diff(old, newer).forall(_.kind == Added)
}
