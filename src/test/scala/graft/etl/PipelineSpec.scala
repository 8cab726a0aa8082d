package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end DAG test: landing JSON → concurrent dim loads → fact
  * load, on a temp warehouse. Pins the intended star-schema semantics
  * (natural keys kept, FKs resolve) that the as-built reference gets
  * wrong (SURVEY.md §2.1 C). */
class PipelineSpec extends SparkSpec {

  private lazy val out = Files.createTempDirectory("graft-pipe").toString
  private lazy val result = {
    Pipeline.writeLanding(spark, s"$out/landing", "2026-08-12")
    Pipeline.run(spark, s"$out/landing", s"$out/wh", "2026-08-12")
  }

  test("pipeline writes all five warehouse tables with declared schemas") {
    val (factRows, dimCounts) = result
    assert(factRows > 0)
    assert(dimCounts.keySet == Set(
      "dim_playlist", "dim_artist", "dim_track", "dim_platform"))
    assert(dimCounts.values.forall(_ > 0))
    val fact = spark.read.parquet(s"$out/wh/fact_songs")
    assert(fact.schema.fieldNames.toSeq == Pipeline.factSchema.fieldNames.toSeq)
    assert(fact.schema("added_at").dataType.typeName == "timestamp")
  }

  test("fact FKs resolve: non-local rows carry non-null dim ids (intended C1/C2)") {
    val fact = spark.read.parquet(s"$out/wh/fact_songs")
    // artist dim excludes null-id (local) artists (B3), so local rows
    // may carry a null dim_artist_id; all playlist/track/user/platform
    // FKs must resolve for every row.
    assert(fact.where(col("dim_playlist_id").isNull).count() == 0)
    assert(fact.where(col("dim_track_id").isNull).count() == 0)
    assert(fact.where(col("dim_user_id").isNull).count() == 0)
    assert(fact.where(col("dim_platform_id") =!= "spotify").count() == 0)
    assert(fact.where(col("dim_artist_id").isNull && !col("is_local"))
      .count() == 0)
  }

  test("dims dedup before keygen: one surrogate per distinct name") {
    val artists = spark.read.parquet(s"$out/wh/dim_artist")
    assert(artists.count() == artists.select("name").distinct().count())
    assert(artists.count() ==
      artists.select("dim_artist_id").distinct().count())
    // surrogate format: 'c' + 9 base36 chars (reference Cuid fidelity)
    assert(artists.where(!col("dim_artist_id").rlike("^c[0-9a-z]{9}$"))
      .count() == 0)
  }

  test("landing roundtrip is schema-on-read JSON, date-partitioned") {
    val p = spark.read.schema(SongsEtl.playlistsDocSchema)
      .json(s"$out/landing/spotify/playlists/2026-08-12")
    assert(p.schema == SongsEtl.playlistsDocSchema)
    assert(p.count() == 20)
  }

  test("permissive landing read quarantines malformed lines and keeps " +
    "the batch alive") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-quar")
    val lines = Seq(
      """{"id": "a", "n": 1}""",
      """{"id": "b", "n": 2}""",
      """{"id": "c", "n": NOT_JSON}""", // malformed — must quarantine
      """{"id": "d", "n": "not-a-number"}""", // schema-violating
      """{"id": "e", "n": 3}""")
    java.nio.file.Files.write(dir.resolve("part-0.json"),
      String.join("\n", lines: _*).getBytes)
    val schema = StructType(Seq(StructField("id", StringType),
      StructField("n", LongType)))
    val (clean, quarantine) =
      Pipeline.readLandingQuarantined(spark, dir.toString, schema)
    assert(clean.count() == 3)
    assert(clean.collect().map(_.getString(0)).toSet == Set("a", "b", "e"))
    val bad = quarantine.collect().map(_.getString(0))
    assert(bad.length == 2, s"expected 2 quarantined lines: ${bad.toSeq}")
    // the raw line survives verbatim for replay/debugging
    assert(bad.exists(_.contains("NOT_JSON")))
    assert(bad.exists(_.contains("not-a-number")))
  }
}
