package graft

import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Driver-hasher portability convention (VERDICT r10 task 2): the
  * correctness harness canonicalizes parquet DECIMAL differently from
  * the DuckDB oracle's decimal serializer — the ONLY red row of round
  * 10 (`x110_burstiness`) was a value-exact DECIMAL(38,0) column whose
  * two spellings hashed apart. The repo convention (x32/x104/x110) is
  * therefore: exact wide-integer arithmetic may use decimal INTERNALLY,
  * but every `SparkEntry.queries` result column must land in the
  * hash-portable type set — string / integral / double / float /
  * binary / boolean / date / timestamp (and arrays/structs/maps
  * thereof). A decimal that must be exported exactly is exported as
  * its digit STRING.
  *
  * This spec walks every query's ANALYZED schema at sf0.001 and fails
  * with the offending (query, column, type) triples, so the artifact
  * class cannot recur silently. Note that query CONSTRUCTION is not
  * purely analysis for every key — e.g. x125's containmentEstimate
  * runs an eager localCheckpoint — so this spec executes real (small,
  * sf0.001) jobs for those queries as a side effect of asking for the
  * schema.
  */
class SchemaConventionSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def decimalsIn(dt: DataType, path: String): Seq[String] = dt match {
    case _: DecimalType => Seq(s"$path: $dt")
    case a: ArrayType => decimalsIn(a.elementType, s"$path[]")
    case m: MapType =>
      decimalsIn(m.keyType, s"$path.key") ++ decimalsIn(m.valueType, s"$path.value")
    case s: StructType =>
      s.fields.toSeq.flatMap(f => decimalsIn(f.dataType, s"$path.${f.name}"))
    case _ => Seq.empty
  }

  test("no SparkEntry query result schema contains DecimalType") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val schema =
          try q(spark, dir).schema
          catch {
            case scala.util.control.NonFatal(e) =>
              fail(s"query $name failed to analyze at sf0.001: $e")
          }
        schema.fields.toSeq.flatMap(f =>
          decimalsIn(f.dataType, s"$name/${f.name}"))
    }
    assert(offenders.isEmpty,
      s"decimal-typed output columns (not driver-hash-portable):\n${offenders.mkString("\n")}")
  }
}
