package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ML Pipeline API (reference `flink-ml-parent/flink-ml-api/src/main/java/
  * org/apache/flink/ml/api/core/{PipelineStage,Transformer,Estimator,Model,
  * Pipeline}.java` + `api/misc/param/Params.java`): a pipeline is an ordered
  * list of stages; `Pipeline.fit` walks the list, fitting each Estimator on
  * the data AS TRANSFORMED SO FAR and replacing it with its fitted Model
  * (ref Pipeline.java `fit` contract), producing a PipelineModel whose
  * `transform` chains every stage. Params are a typed key→value map
  * (`WithParams`), kept on each stage.
  *
  * Spark-first: a stage is DataFrame → DataFrame, so the whole fitted
  * pipeline is one composed lazy plan — Catalyst fuses the transformer
  * chain into the downstream query exactly like hand-written selects; only
  * an Estimator's fit materializes anything (and the KMeans fit collects
  * nothing but the k×dim centroid table).
  *
  * Two concrete stages ship with the engine: [[Int8Quantizer]] (the
  * pipeline-ready form of q_emb_quantize — symmetric per-vector int8,
  * exact integer outputs) and [[KMeans]] wrapping the deterministic Lloyd
  * fit that q_ann_kmeans/q_semdedup already prove. The quantizer's exact
  * integers are what make the fitted pipeline bit-reproducible in DuckDB.
  */
object MlPipeline {

  /** Typed parameter map (ref api/misc/param/Params.java — get with
    * default, set returns the stage's params). */
  final case class Params(m: Map[String, Any] = Map.empty) {
    def set(key: String, value: Any): Params = Params(m + (key -> value))
    def get[T](key: String, default: T): T =
      m.getOrElse(key, default).asInstanceOf[T]
  }

  sealed trait PipelineStage { def params: Params }
  trait Transformer extends PipelineStage {
    def transform(df: DataFrame): DataFrame
  }
  trait Model extends Transformer
  trait Estimator extends PipelineStage {
    def fit(df: DataFrame): Model
  }

  /** Ordered stage list; fit folds left per the reference contract. */
  final case class Pipeline(stages: Seq[PipelineStage]) {
    def fit(df: DataFrame): PipelineModel = {
      var cur = df
      val fitted = stages.map {
        case t: Model => cur = t.transform(cur); t
        case t: Transformer => cur = t.transform(cur); t
        case e: Estimator =>
          val m = e.fit(cur)
          cur = m.transform(cur)
          m
      }
      PipelineModel(fitted)
    }
  }

  final case class PipelineModel(stages: Seq[Transformer]) extends Model {
    val params: Params = Params()
    def transform(df: DataFrame): DataFrame =
      stages.foldLeft(df)((d, t) => t.transform(d))
  }

  /** Symmetric int8 quantization of `inputCol` in place: scale =
    * max|x|/127, q = floor(x/scale + 0.5). Outputs are exact small
    * integers (stored as float — lossless ≤ 127), so every downstream
    * arithmetic result is bit-identical across engines. */
  final case class Int8Quantizer(inputCol: String = "embedding",
                                 params: Params = Params()) extends Transformer {
    def transform(df: DataFrame): DataFrame =
      df.withColumn(inputCol, expr(
        s"""transform($inputCol, x -> cast(floor(cast(x AS DOUBLE) /
           | (array_max(transform($inputCol, y -> abs(cast(y AS DOUBLE)))) / 127.0D)
           | + 0.5D) AS FLOAT))""".stripMargin.replace("\n", "")))
  }

  /** Lloyd k-means estimator over (vec_id, embedding): deterministic init
    * (vectors 0..k-1), cosine assignment rounded to 6, centroids rounded
    * to 6 per dimension — the engine's oracle-reproducible fit. */
  final case class KMeans(k: Int = 8, iters: Int = 2,
                          params: Params = Params()) extends Estimator {
    def fit(df: DataFrame): Model = {
      val emb = df
        .withColumn("nrm", graft.functions.VecOps.norm(col("embedding")))
        .select(col("vec_id"), col("embedding"), col("nrm"))
        .cache()
      val cents = try Similarity.kmeansFit(emb, k, iters)
      finally emb.unpersist()
      KMeansModel(cents)
    }
  }

  final case class KMeansModel(centroids: Seq[(Int, Seq[Double])],
                               params: Params = Params()) extends Model {
    def transform(df: DataFrame): DataFrame = {
      val emb = df.withColumn("nrm", graft.functions.VecOps.norm(col("embedding")))
      df.join(Similarity.kmeansAssign(emb, centroids), Seq("vec_id"))
        .withColumnRenamed("cid", "cluster")
    }
  }

  /** q_ml_pipeline: quantize → fit k-means → assign, end to end through
    * the Pipeline API; the DuckDB oracle replays the identical quantized
    * Lloyd fit. */
  def mlPipeline(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val model = Pipeline(Seq(Int8Quantizer(), KMeans(k = 8, iters = 2)))
      .fit(emb)
    model.transform(emb)
      .select(col("vec_id"), col("cluster"))
      .orderBy("vec_id")
  }

  val sql: Map[String, String] = Map(
    "q_ml_pipeline" -> (graft.LlmOracles.kmeansCtesOn(
      """SELECT vec_id, list_transform(v0, x -> floor(x / s + 0.5)) AS v FROM (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0,
        |  list_max(list_transform(CAST(embedding AS DOUBLE[]), y -> abs(y))) / 127.0 AS s
        | FROM embeddings)""".stripMargin) + """
      |SELECT vec_id, cid AS cluster FROM asg ORDER BY vec_id""".stripMargin),
  )
}
