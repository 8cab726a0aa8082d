package graft.etl

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Reference-parity semantics on the landing-document shapes —
  * the edge cases SURVEY.md §7.4 calls out: B2 default-9999, B3
  * null-key filter, F4 missing-artists drop, E2 null-on-bad-input
  * coercion, D2 dedup-before-keygen ordering, C1/C2/C3 intended
  * star-schema join semantics.
  */
class SongsEtlSpec extends SparkSpec {

  private def df(json: Seq[String], schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import spark.implicits._
    spark.read.schema(schema).json(json.toDS)
  }

  private val tracksDoc = df(Seq(
    // pl1: two tracks; t2 has no artists array (F4: must vanish)
    """{"playlist_id":"pl1","tracks":[
       {"added_at":"2024-01-01T00:00:00Z","is_local":false,"id":"t1",
        "name":"Song A","duration_ms":1000,"explicit":false,
        "album":{"id":"al1","name":"Alb","release_date":"2020",
                 "images":[]},
        "artists":[{"id":"a1","name":"Artist One"},
                   {"id":null,"name":"Local Guy"}]},
       {"added_at":"bad-timestamp","is_local":true,"id":"t2",
        "name":"Song B","duration_ms":2000,"explicit":true,
        "album":{"id":"al2","name":"Alb2","release_date":"2021",
                 "total_tracks":12,"images":[]}}]}""",
    """{"playlist_id":"pl2","tracks":[
       {"added_at":"2024-02-02T00:00:00Z","is_local":false,"id":"t1",
        "name":"Song A","duration_ms":1000,"explicit":false,
        "album":{"id":"al1","name":"Alb","release_date":"2020",
                 "total_tracks":5,"images":[]},
        "artists":[{"id":"a1","name":"Artist One"}]}]}"""
  ).map(_.replaceAll("\n\\s*", "")), SongsEtl.tracksDocSchema)

  private val playlistsDoc = df(Seq(
    """{"spotify_id":"u1","playlists":[{"id":"pl1","name":"Mix"},
        {"id":"pl2","name":"Chill"}]}""",
    """{"spotify_id":"u2","playlists":[{"id":"pl9","name":"Mix"}]}"""
  ).map(_.replaceAll("\n\\s*", "")), SongsEtl.playlistsDocSchema)

  test("B2: missing album.total_tracks defaults to 9999") {
    val pruned = SongsEtl.pruneTracks(tracksDoc)
      .select(col("playlist_id"), explode(col("tracks")).as("t"))
      .select(col("playlist_id"), col("t.id").as("id"),
        col("t.album.total_tracks").as("tt"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pruned(("pl1", "t1")) == 9999L) // absent → default
    assert(pruned(("pl1", "t2")) == 12L)
    assert(pruned(("pl2", "t1")) == 5L) // present → preserved
  }

  test("B3: artist dim drops null-id artists, dedups on name") {
    val names = SongsEtl.artistDim(tracksDoc).collect().map(_.getString(0))
    assert(names.toSet == Set("Artist One")) // Local Guy filtered, dupes collapsed
  }

  test("F4: tracks with missing artists array produce zero fact rows") {
    val dimU = { import spark.implicits._
      Seq(("u1", "du1"), ("u2", "du2")).toDF("spotify_id", "dim_user_id") }
    val dimP = { import spark.implicits._
      Seq(("dp1", "pl1"), ("dp2", "pl2")).toDF("dim_playlist_id", "playlist_id") }
    val dimA = { import spark.implicits._
      Seq(("da1", "Artist One")).toDF("dim_artist_id", "artist_name") }
    val dimT = { import spark.implicits._
      Seq(("dt1", "Song A"), ("dt2", "Song B")).toDF("dim_track_id", "track_name") }
    val fact = SongsEtl.factSongs(playlistsDoc, tracksDoc,
      dimP, dimA, dimT, dimU).cache()
    // pl1×t1 → 2 rows (a1 + null-id artist: fact grain keeps them,
    // only the artist *dim* filters B3), pl1×t2 → 0 (no artists
    // array), pl2×t1 → 1. Total 3.
    assert(fact.count() == 3)
  }

  test("E2: invalid added_at coerces to NULL, not error") {
    val dimU = { import spark.implicits._
      Seq(("u1", "du1")).toDF("spotify_id", "dim_user_id") }
    val empty = { import spark.implicits._
      Seq.empty[(String, String)].toDF("dim_playlist_id", "playlist_id") }
    val emptyA = { import spark.implicits._
      Seq.empty[(String, String)].toDF("dim_artist_id", "artist_name") }
    val emptyT = { import spark.implicits._
      Seq.empty[(String, String)].toDF("dim_track_id", "track_name") }
    val fact = SongsEtl.factSongs(playlistsDoc, tracksDoc,
      empty, emptyA, emptyT, dimU)
    // all surviving rows parse their timestamps (t2 dropped with its
    // bad-timestamp by F4); re-add one via a doc with artists+bad ts
    assert(fact.where(col("added_at").isNull).count() == 0)
    val badDoc = df(Seq(
      """{"playlist_id":"pl1","tracks":[{"added_at":"nope","is_local":false,
         "id":"t9","name":"X","duration_ms":1,"explicit":false,
         "album":{"id":"a","name":"n","release_date":"r","total_tracks":1,
                  "images":[]},
         "artists":[{"id":"z","name":"Z"}]}]}""".replaceAll("\n\\s*", "")),
      SongsEtl.tracksDocSchema)
    val fact2 = SongsEtl.factSongs(playlistsDoc, badDoc,
      empty, emptyA, emptyT, dimU)
    assert(fact2.where(col("added_at").isNull).count() == 1)
  }

  test("C3 intended: playlist resolves to owning user via equi-join") {
    val dimU = { import spark.implicits._
      Seq(("u1", "du1"), ("u2", "du2")).toDF("spotify_id", "dim_user_id") }
    val empty = { import spark.implicits._
      Seq.empty[(String, String)].toDF("dim_playlist_id", "playlist_id") }
    val emptyA = { import spark.implicits._
      Seq.empty[(String, String)].toDF("dim_artist_id", "artist_name") }
    val emptyT = { import spark.implicits._
      Seq.empty[(String, String)].toDF("dim_track_id", "track_name") }
    val fact = SongsEtl.factSongs(playlistsDoc, tracksDoc,
      empty, emptyA, emptyT, dimU)
    val users = fact.select(col("dim_user_id")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(users == Set("du1")) // pl1/pl2 both owned by u1
  }

  test("D2 ordering: dedup happens before keygen (keys are distinct)") {
    import graft.expr.Cuid
    val dim = SongsEtl.artistDim(tracksDoc)
      .withColumn("dim_artist_id", Cuid.cuid())
    val rows = dim.collect()
    assert(rows.length == rows.map(_.getString(0)).distinct.length)
  }
}
