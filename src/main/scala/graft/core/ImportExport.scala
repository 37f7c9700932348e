package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Import/export + random data generation — reference
  * `ProtoImporterExporter.scala` / `AdamImporter.scala` (generic
  * CSV/JSON import via the Spark reader, `DataDefintion.scala:637-688`)
  * and `RandomDataOp.scala:25-100`. */
object ImportExport {

  /** Generic file import: format in {parquet, csv, json, orc, avro}. */
  def importTable(spark: SparkSession, format: String, path: String,
                  options: Map[String, String] = Map.empty): DataFrame =
    spark.read.options(options).format(format).load(path)

  def importInto(entity: Entity, df: DataFrame): Entity = entity.insert(df)

  def export(df: DataFrame, format: String, path: String,
             options: Map[String, String] = Map.empty): Unit =
    df.write.mode("overwrite").options(options).format(format).save(path)
}

/** Typed random data generation, fully distributed (`spark.range` +
  * column expressions — no driver-side row building, unlike the
  * reference's batched insert loop capped at 100k rows/batch). */
object RandomData {

  /** (id, feature vector[dims] uniform [0,1), intfield, stringfield). */
  def generate(spark: SparkSession, n: Long, dims: Int, seed: Long = 42L): DataFrame =
    spark.range(n)
      .withColumn("feature",
        transform(sequence(lit(0), lit(dims - 1)),
          d => pmod(xxhash64(col("id"), d, lit(seed)), lit(1000000L)).cast("double") / 1000000.0)
          .cast("array<float>"))
      .withColumn("intfield", pmod(xxhash64(col("id"), lit(seed + 1)), lit(1000L)).cast("int"))
      .withColumn("stringfield", concat(lit("s"), pmod(xxhash64(col("id"), lit(seed + 2)), lit(100L))))

  /** Gaussian vectors via Box–Muller over two derived uniforms. */
  def generateGaussian(spark: SparkSession, n: Long, dims: Int, seed: Long = 42L): DataFrame = {
    def unit(salt: Int) = (c: org.apache.spark.sql.Column) =>
      (pmod(xxhash64(c, lit(seed + salt)), lit(1000000L)).cast("double") + 0.5) / 1000001.0
    spark.range(n)
      .withColumn("feature",
        transform(sequence(lit(0), lit(dims - 1)), d => {
          val u1 = unit(1)(concat(col("id"), lit("_"), d))
          val u2 = unit(2)(concat(col("id"), lit("_"), d))
          (sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)).cast("float")
        }))
  }
}
