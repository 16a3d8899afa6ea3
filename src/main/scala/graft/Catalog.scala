package graft

import graft.queries._

/** Registry of every implemented engine capability (SURVEY.md §2
  * inventory + LLM-pipeline extensions). `SparkEntry` derives the
  * driver-facing maps from this, `Bench` runs the `headline` subset.
  */
object Catalog {
  def all: Seq[QueryDef] =
    RelationalQueries.defs ++
      AggregateQueries.defs ++
      WindowQueries.defs ++
      SetOpQueries.defs ++
      SubqueryQueries.defs ++
      ScalarQueries.defs ++
      TextQueries.defs ++
      SampleQueries.defs ++
      SketchQueries.defs ++
      DedupQueries.defs ++
      SimilarityQueries.defs ++
      EvalQueries.defs ++
      MultimodalQueries.defs ++
      PipelineQueries.defs ++
      StreamingQueries.defs ++
      CorpusPrepQueries.defs ++
      EventAnalyticsQueries.defs ++
      MigrationQueries.defs ++
      GraphQueries.defs ++
      LayoutQueries.defs ++
      AffinityQueries.defs ++
      FuzzQueries.defs

  def byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap

  def headline: Seq[QueryDef] = all.filter(_.headline)
}
