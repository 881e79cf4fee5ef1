package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructField, StructType}

/** One-level struct flattening — the reference engine's signature operator
  * (`flat_df`, reference zoom_proc.py:95-104, identically repeated in
  * vk_proc.py:87-96, monkey_proc.py:87-96, jhub_proc.py:88-97).
  *
  * Semantics faithfully preserved:
  *   - Non-struct columns are kept as-is, in their original order, first.
  *   - Each struct column is replaced by its fields (in schema order),
  *     appended after all flat columns, struct columns in original order.
  *   - Default alias is `structCol_field`; when `prefix` is supplied it is
  *     applied to the fields of EVERY struct column (`prefix + field`),
  *     which loses provenance and can collide — a quirk of the reference
  *     (see monkey_proc.py:305-315) that downstream contracts depend on.
  *   - One level per call: nested structs need repeated calls
  *     (vk_proc.py:231,252). Use [[flattenAll]] for full recursion.
  */
object Flatten {

  def flatten(df: DataFrame, prefix: Option[String] = None): DataFrame = {
    // Python-falsy quirk preserved: the reference's `prefix or default`
    // treats an EMPTY prefix as no prefix (vk_proc.py:93-94 called with
    // prefix='' at vk_proc.py:129 still yields ncol_field names).
    val effPrefix = prefix.filter(_.nonEmpty)
    val (nested, flat) =
      df.schema.fields.partition(_.dataType.isInstanceOf[StructType])
    val flatCols = flat.map(f => col(escape(f.name)))
    val nestedCols = nested.flatMap { nf =>
      nf.dataType.asInstanceOf[StructType].fields.map { sf =>
        val alias = effPrefix match {
          case Some(p) => p + sf.name
          case None    => nf.name + "_" + sf.name
        }
        col(escape(nf.name) + "." + escape(sf.name)).alias(alias)
      }
    }
    df.select((flatCols ++ nestedCols).toSeq: _*)
  }

  /** Recursive variant for new code: flattens structs to any depth, always
    * provenance-preserving (`a_b_c` path names joined by `sep`).
    */
  def flattenAll(df: DataFrame, sep: String = "_"): DataFrame = {
    def expand(prefixPath: Seq[String], field: StructField): Seq[(Seq[String], Seq[String])] = {
      val path = prefixPath :+ field.name
      field.dataType match {
        case st: StructType => st.fields.toSeq.flatMap(expand(path, _))
        case _              => Seq((path, path))
      }
    }
    val cols = df.schema.fields.toSeq.flatMap(expand(Nil, _)).map {
      case (path, _) =>
        col(path.map(escape).mkString(".")).alias(path.mkString(sep))
    }
    df.select(cols: _*)
  }

  private def escape(name: String): String = "`" + name.replace("`", "``") + "`"
}
