package graft.queries

/** All declared queries, one per implemented operator (SURVEY.md §2).
  * Domain objects register here; SparkEntry exposes the flattened maps.
  */
object Registry {
  def all: Seq[QuerySpec] =
    Relational.all ++ Temporal.all ++ TextAnalysis.all ++ Dedup.all ++
      Similarity.all ++ PipelineQueries.all ++ Multimodal.all ++
      Sources.all ++ Sql.all ++ SqlTpch.all ++ Analytic.all ++
      TrainingPipeline.all ++ Curation.all ++ Warehouse.all ++ Quality.all ++
      Statistics.all ++ Profiling.all ++ Corpus.all ++ Inference.all ++
      Mining.all ++ Operations.all ++ Insights.all ++ Selection.all

  def byName(name: String): QuerySpec =
    all.find(_.name == name)
      .getOrElse(throw new NoSuchElementException(s"query: $name"))
}
