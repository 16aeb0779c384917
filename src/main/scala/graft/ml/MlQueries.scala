package graft.ml

import graft.{Q, QueryModule}

/** Rows-only ML queries (solver outputs are not oracle-checkable). */
object MlQueries extends QueryModule {
  override def queries: Seq[Q] = Seq(
    Q("q43_ml_train_score", (s, d) => Scoring.trainAndScore(s, d), None),
  )
}
