package graft.queries

/** All declared queries, one per implemented operator (SURVEY.md §2).
  * Domain objects register here; SparkEntry exposes the flattened maps.
  */
object Registry {
  /** Query family = the domain object that registered it — the grain
    * the bench record's `families` rollup reports, so round-over-round
    * compares can catch family-level regressions that per-query
    * sub-second noise hides.
    */
  private val byFamily: Seq[(String, Seq[QuerySpec])] = Seq(
    "relational" -> Relational.all, "temporal" -> Temporal.all,
    "text" -> TextAnalysis.all, "dedup" -> Dedup.all,
    "similarity" -> Similarity.all, "pipeline" -> PipelineQueries.all,
    "multimodal" -> Multimodal.all, "sources" -> Sources.all,
    "sql" -> Sql.all, "sql_tpch" -> SqlTpch.all,
    "analytic" -> Analytic.all, "training" -> TrainingPipeline.all,
    "curation" -> Curation.all, "warehouse" -> Warehouse.all,
    "quality" -> Quality.all, "statistics" -> Statistics.all,
    "profiling" -> Profiling.all, "corpus" -> Corpus.all,
    "inference" -> Inference.all, "mining" -> Mining.all,
    "operations" -> Operations.all, "insights" -> Insights.all,
    "selection" -> Selection.all)

  def all: Seq[QuerySpec] = byFamily.flatMap(_._2)

  /** query name → family name. */
  def familyOf: Map[String, String] =
    byFamily.flatMap { case (f, qs) => qs.map(_.name -> f) }.toMap

  def byName(name: String): QuerySpec =
    all.find(_.name == name)
      .getOrElse(throw new NoSuchElementException(s"query: $name"))
}
