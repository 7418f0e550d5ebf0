package graft

import graft.etl.EntityBuilder

/** Shared, once-per-JVM expensive fixtures (the reference-data ETL takes
  * minutes; every suite reusing it would otherwise rebuild it). */
object Fixtures {
  lazy val built: EntityBuilder.Built = {
    val b = EntityBuilder.build(SparkTestBase.session,
      "/root/reference/data/2025-11-07-extracted-entities-cleaned.csv")
    EntityBuilder.Built(
      b.entities.localCheckpoint(true),
      b.edges.localCheckpoint(true))
  }
}
