package graft.etl

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.expr.Cuid
import graft.io.Tables

/** The reference's full DAG (songs-etl `terraform/workflow.tf:11-70`)
  * as one Spark driver program — EP1-landing → EP2 dims → EP3 fact:
  *
  *   1. landing JSON documents, date-partitioned
  *      (`spotify/{playlists,tracks}/{date}.json`, E4) — here written
  *      by [[writeLanding]] from deterministic fixture rows, then read
  *      back schema-on-read (A1) exactly like the reference's
  *      functions re-read their own landing bucket;
  *   2. the four dimension builds run CONCURRENTLY (G1's `parallel`
  *      fan-out — independent DataFrame writes are independent Spark
  *      jobs, so plain Futures give the same DAG shape the Cloud
  *      Workflow gets from its parallel branches);
  *   3. the fact build joins landing + dims and truncate-loads
  *      (G3 `SaveMode.Overwrite`), clustered like the reference's
  *      BigQuery layout (G4: sortWithinPartitions inside
  *      [[Tables.writeConformed]]).
  *
  * Every table carries (surrogate, natural key) — the intended
  * star-schema semantics (SURVEY.md §2.1 C note).
  */
object Pipeline {

  // ---- Warehouse schemas (terraform/bigquery.tf:8-181, + natural keys) ----

  val dimPlaylistSchema: StructType = StructType(Seq(
    StructField("dim_playlist_id", StringType),
    StructField("playlist_id", StringType), // natural key (intended)
    StructField("name", StringType)))

  val dimArtistSchema: StructType = StructType(Seq(
    StructField("dim_artist_id", StringType),
    StructField("name", StringType)))

  val dimTrackSchema: StructType = StructType(Seq(
    StructField("dim_track_id", StringType),
    StructField("name", StringType)))

  val dimPlatformSchema: StructType = StructType(Seq(
    StructField("dim_platform_id", StringType),
    StructField("name", StringType)))

  val factSchema: StructType = StructType(Seq(
    StructField("dim_platform_id", StringType),
    StructField("dim_playlist_id", StringType),
    StructField("dim_artist_id", StringType),
    StructField("dim_track_id", StringType),
    StructField("dim_user_id", StringType),
    StructField("added_at", TimestampType),
    StructField("is_local", BooleanType)))

  // ---- Deterministic landing fixtures (FIXTURES.md §1 shapes) ----

  /** Synthesize landing documents for `nUsers` users and write them as
    * date-partitioned JSON (the reference's landing bucket, A3/E4). */
  def writeLanding(spark: SparkSession, landingDir: String,
                   snapshotDate: String, nUsers: Int = 20): Unit = {
    import spark.implicits._
    val users = (1 to nUsers).map(u => f"user_$u%03d")
    val playlistsDocs = users.zipWithIndex.map { case (u, i) =>
      (u, (0 to i % 3).map(p => (s"pl_${u}_$p", s"Playlist ${i % 5}_$p")))
    }.toDF("spotify_id", "playlists")
      .select(col("spotify_id"), transform(col("playlists"),
        p => struct(p("_1").as("id"), p("_2").as("name"))).as("playlists"))

    val tracksDocs = playlistsDocs
      .select(explode(col("playlists.id")).as("playlist_id"))
      .as[String].collect().toSeq.map { pid =>
        val n = 1 + math.abs(pid.hashCode % 4)
        (pid, (0 until n).map { t =>
          val tid = s"tr_${pid}_$t"
          (s"2024-0${1 + t % 9}-15T12:00:0${t % 10}Z", t % 7 == 6, tid,
            s"Track ${math.abs(tid.hashCode % 40)}", 180000L + t * 1000,
            t % 5 == 0,
            (s"al_$pid", s"Album ${math.abs(pid.hashCode % 10)}",
              "2024-01-01", if (t % 3 == 0) None else Some(10L + t),
              Seq((s"http://img/$tid", 64L, 64L))),
            if (t % 7 == 6) Seq((Option.empty[String], "Local Artist"))
            else (0 to t % 2).map(a =>
              (Option(s"ar_${math.abs((pid + a).hashCode % 15)}"),
                s"Artist ${math.abs((pid + a).hashCode % 15)}")))
        })
      }.toDF("playlist_id", "tracks")
      .select(col("playlist_id"), transform(col("tracks"), t => struct(
        t("_1").as("added_at"), t("_2").as("is_local"), t("_3").as("id"),
        t("_4").as("name"), t("_5").as("duration_ms"), t("_6").as("explicit"),
        struct(t("_7")("_1").as("id"), t("_7")("_2").as("name"),
          t("_7")("_3").as("release_date"),
          t("_7")("_4").as("total_tracks"),
          transform(t("_7")("_5"), i => struct(i("_1").as("url"),
            i("_2").as("height"), i("_3").as("width"))).as("images"))
          .as("album"),
        transform(t("_8"), a => struct(a("_1").as("id"), a("_2").as("name")))
          .as("artists"))).as("tracks"))

    playlistsDocs.write.mode("overwrite")
      .json(s"$landingDir/spotify/playlists/$snapshotDate")
    tracksDocs.write.mode("overwrite")
      .json(s"$landingDir/spotify/tracks/$snapshotDate")
  }

  /** PERMISSIVE landing read with corrupt-record quarantine — the
    * landing-zone contract the reference lacks entirely (a malformed
    * API payload crashes `cf_transform/main.py` mid-load): rows that
    * fail the declared schema land in a quarantine frame (raw line
    * preserved for replay/debugging) instead of killing the batch or
    * silently nulling out. Returns (clean, quarantine).
    *
    * The frame is cached before splitting: Spark refuses a query that
    * projects ONLY the internal corrupt-record column from a lazy JSON
    * scan (SPARK-21610), and the cache also makes clean/quarantine one
    * parse pass instead of two — at 100 TB the double-parse, not the
    * cache, is the thing to avoid. */
  def readLandingQuarantined(spark: SparkSession, path: String,
                             schema: StructType): (DataFrame, DataFrame) = {
    val withCr = schema.add(StructField("_corrupt_record", StringType))
    val raw = spark.read.schema(withCr)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache()
    val clean = raw.where(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val quarantine = raw.where(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    (clean, quarantine)
  }

  /** Read-only seed dimension (the reference never writes dim_user —
    * SURVEY.md §1.2). */
  def dimUserSeed(spark: SparkSession, nUsers: Int = 20): DataFrame = {
    import spark.implicits._
    (1 to nUsers).map(u => (f"du_$u%04d", s"User $u", f"user_$u%03d"))
      .toDF("dim_user_id", "name", "spotify_id")
  }

  /** Run the full DAG: landing → 4 concurrent dim loads → fact load.
    * Returns (fact rows, per-dim rows). */
  def run(spark: SparkSession, landingDir: String, warehouseDir: String,
          snapshotDate: String): (Long, Map[String, Long]) = {
    val landingPlaylists = spark.read.schema(
      StructType(SongsEtl.playlistsDocSchema))
      .json(s"$landingDir/spotify/playlists/$snapshotDate")
    val landingTracks = spark.read.schema(SongsEtl.tracksDocSchema)
      .json(s"$landingDir/spotify/tracks/$snapshotDate")

    // EP2 ×4, concurrent (G1 parallel branches). Each adds the
    // surrogate key AFTER dedup (D2-D4 intended order) and keeps the
    // natural key where the reference commented it out (§2.1 C).
    implicit val ec: ExecutionContext = ExecutionContext.global
    val dimJobs = Map[String, () => (DataFrame, StructType, String)](
      // dim_playlist dedups on its NATURAL KEY, not name: the fact
      // join (C1) is by playlist id, and name-dedup would orphan
      // same-named playlists — the one place the reference's
      // "intended dedup on name" (D4) can't give it the resolvable
      // FK its own schema declares (bigquery.tf:22-24).
      "dim_playlist" -> (() => (
        SongsEtl.playlistDim(landingPlaylists)
          .withColumn("dim_playlist_id", Cuid.cuid()),
        dimPlaylistSchema, "dim_playlist_id")),
      "dim_artist" -> (() => (
        SongsEtl.artistDim(landingTracks)
          .withColumn("dim_artist_id", Cuid.cuid()),
        dimArtistSchema, "dim_artist_id")),
      "dim_track" -> (() => (
        SongsEtl.trackDim(landingTracks)
          .withColumn("dim_track_id", Cuid.cuid()),
        dimTrackSchema, "dim_track_id")),
      "dim_platform" -> (() => (
        SongsEtl.platformDim(spark), dimPlatformSchema, "dim_platform_id")),
    )
    val futures = dimJobs.map { case (name, build) =>
      Future {
        val (df, schema, sortCol) = build()
        Tables.writeConformed(df, schema, s"$warehouseDir/$name",
          sortCols = Seq(sortCol))
        name -> spark.read.parquet(s"$warehouseDir/$name").count()
      }
    }
    val dimCounts = Await.result(Future.sequence(futures), Duration.Inf).toMap

    // EP3: fact build over landing + the just-written dims.
    val fact = SongsEtl.factSongs(
      landingPlaylists, landingTracks,
      spark.read.parquet(s"$warehouseDir/dim_playlist"),
      spark.read.parquet(s"$warehouseDir/dim_artist")
        .select(col("dim_artist_id"), col("name").as("artist_name")),
      spark.read.parquet(s"$warehouseDir/dim_track")
        .select(col("dim_track_id"), col("name").as("track_name")),
      dimUserSeed(spark))
    // G4: cluster like bigquery.tf:13 via sortWithinPartitions (in
    // writeConformed). NO repartition on dim_platform_id: it's a
    // constant literal on every row — the textbook hot key (see
    // ops.Skew) — and hashing on it would funnel the whole fact
    // through one task.
    Tables.writeConformed(
      fact,
      factSchema, s"$warehouseDir/fact_songs",
      sortCols = Seq("dim_platform_id", "dim_playlist_id", "dim_user_id"))
    (spark.read.parquet(s"$warehouseDir/fact_songs").count(), dimCounts)
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft-pipeline")
    val spark = graft.Session.local("graft-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    val date = "2026-08-12"
    writeLanding(spark, s"$out/landing", date)
    val (factRows, dimCounts) = run(
      spark, s"$out/landing", s"$out/warehouse", date)
    println(s"PIPELINE fact_songs=$factRows dims=$dimCounts")
    spark.stop()
  }
}
