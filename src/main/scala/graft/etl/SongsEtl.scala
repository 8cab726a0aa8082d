package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-parity ETL over the landing-document shapes
  * (FIXTURES.md §1; songs-etl `cf_extract/main.py:220-232,258-291`).
  *
  * The reference hand-rolls every step as Python loops over nested
  * dicts; here each step is one declarative transform so Catalyst
  * fuses the whole pipeline into a single whole-stage-codegen'd plan:
  *
  *   - unnest (F1-F4)            → `explode` / `inline`
  *   - nested projection (B1/B2) → struct/`transform` select + `coalesce`
  *   - null-key filter (B3)      → `where(isNotNull)`
  *   - dedup-then-keygen (D2-D4 *intended* order; the reference's
  *     playlists function keygens first by mistake, SURVEY.md §2.1 D4)
  *   - left joins on natural keys (C1/C2 *intended* semantics; as
  *     built the reference's CUID surrogates never match, §2.1 C)
  *   - timestamp coercion (E2)   → `try_to_timestamp` (null on bad input)
  */
object SongsEtl {

  // ---- Landing schemas (schema-on-read, declared not inferred) ----

  val artistSchema: StructType = StructType(Seq(
    StructField("id", StringType), StructField("name", StringType)))

  val imageSchema: StructType = StructType(Seq(
    StructField("url", StringType), StructField("height", LongType),
    StructField("width", LongType)))

  val albumSchema: StructType = StructType(Seq(
    StructField("id", StringType), StructField("name", StringType),
    StructField("release_date", StringType),
    StructField("total_tracks", LongType),
    StructField("images", ArrayType(imageSchema))))

  val trackSchema: StructType = StructType(Seq(
    StructField("added_at", StringType), StructField("is_local", BooleanType),
    StructField("id", StringType), StructField("name", StringType),
    StructField("duration_ms", LongType), StructField("explicit", BooleanType),
    StructField("album", albumSchema),
    StructField("artists", ArrayType(artistSchema))))

  /** `playlists/{date}.json` row: one per user. (cf_extract:220-225) */
  val playlistsDocSchema: StructType = StructType(Seq(
    StructField("spotify_id", StringType),
    StructField("playlists", ArrayType(StructType(Seq(
      StructField("id", StringType), StructField("name", StringType)))))))

  /** `tracks/{date}.json` row: one per playlist. (cf_extract:286-291) */
  val tracksDocSchema: StructType = StructType(Seq(
    StructField("playlist_id", StringType),
    StructField("tracks", ArrayType(trackSchema))))

  // ---- Projections (extract-side) ----

  /** B1/B2: prune a raw track struct to the reference's projection,
    * defaulting a missing `album.total_tracks` to 9999
    * (cf_extract/main.py:258-279, default at :269). Input column must
    * be a struct matching [[trackSchema]] minus any extra fields.
    */
  def pruneTracks(raw: DataFrame): DataFrame =
    raw.select(
      col("playlist_id"),
      transform(col("tracks"), t => struct(
        t("added_at").as("added_at"),
        t("is_local").as("is_local"),
        t("id").as("id"),
        t("name").as("name"),
        t("duration_ms").as("duration_ms"),
        t("explicit").as("explicit"),
        struct(
          t("album")("id").as("id"),
          t("album")("name").as("name"),
          t("album")("release_date").as("release_date"),
          coalesce(t("album")("total_tracks"), lit(9999L)).as("total_tracks"),
          t("album")("images").as("images")).as("album"),
        t("artists").as("artists"))).as("tracks"))

  // ---- Dimension builds (EP2) ----

  /** dim_playlist rows: 1-level unnest (F1) → dedup on the NATURAL
    * key, keeping (playlist_id, name) — the shape [[factSongs]]'s
    * dimPlaylist contract needs (its C1 join is by playlist id; the
    * reference's intended dedup-on-name, SURVEY §2.1 D4, cannot
    * produce a resolvable FK when names collide — see
    * Pipeline.run's dim_playlist note). Callers add the surrogate. */
  def playlistDim(landingPlaylists: DataFrame): DataFrame =
    landingPlaylists
      .select(explode(col("playlists")).as("p"))
      .select(col("p.id").as("playlist_id"), col("p.name").as("name"))
      .dropDuplicates("playlist_id")

  /** dim_artist: 2-level unnest (F2) + null-key filter (B3) → dedup (D2). */
  def artistDim(landingTracks: DataFrame): DataFrame =
    landingTracks
      .select(explode(col("tracks")).as("t"))
      .select(explode(col("t.artists")).as("a"))
      .where(col("a.id").isNotNull) // B3: local tracks carry null artist ids
      .select(col("a.name").as("name"))
      .dropDuplicates("name")

  /** dim_track: 1-level unnest (F3) → dedup on name (D3). */
  def trackDim(landingTracks: DataFrame): DataFrame =
    landingTracks
      .select(explode(col("tracks")).as("t"))
      .select(col("t.name").as("name"))
      .dropDuplicates("name")

  /** dim_platform: in-memory literal table (A12). */
  def platformDim(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("spotify", "Spotify")).toDF("dim_platform_id", "name")
  }

  // ---- Fact build (EP3) ----

  /** The full fact pipeline (cf_transform/main.py:98-176) as one plan.
    *
    * Dims must carry (surrogate, natural key) pairs — the *intended*
    * star-schema semantics (SURVEY.md §2.1 C): `dimPlaylist(dim_playlist_id,
    * playlist_id, name)` etc. The playlist→owner nested loop (C3) becomes
    * an explode + equi-join; the O(P×U·P̄) scan disappears.
    */
  def factSongs(landingPlaylists: DataFrame, landingTracks: DataFrame,
                dimPlaylist: DataFrame, dimArtist: DataFrame,
                dimTrack: DataFrame, dimUser: DataFrame): DataFrame = {
    // C3 intended: playlist_id → owning user, via unnest + equi-join.
    val playlistOwner = landingPlaylists
      .select(col("spotify_id"), explode(col("playlists")).as("p"))
      .select(col("p.id").as("playlist_id"), col("spotify_id"))

    // F4: fact-grain unnest to (playlist, track, artist); inner explode
    // drops tracks with missing/empty artists arrays, matching the
    // reference's `track.get('artists', [])` + inner loop.
    val grain = landingTracks
      .select(col("playlist_id"), explode(col("tracks")).as("t"))
      .select(
        col("playlist_id"),
        col("t.added_at").as("added_at"),
        col("t.is_local").as("is_local"),
        col("t.id").as("track_id"),
        col("t.name").as("track_name"),
        explode(col("t.artists")).as("a"))
      .select(
        col("playlist_id"), col("added_at"), col("is_local"),
        col("track_id"), col("track_name"),
        col("a.id").as("artist_id"), col("a.name").as("artist_name"),
        lit("spotify").as("dim_platform_id")) // B6

    grain
      .join(playlistOwner, Seq("playlist_id"), "left")
      .dropDuplicates() // D1: pre-join full-row distinct
      // C1 ×3 on natural keys (intended semantics), broadcast: dims are
      // tiny next to the fact at any scale.
      .join(broadcast(dimPlaylist.select(col("dim_playlist_id"),
        col("playlist_id"))), Seq("playlist_id"), "left")
      .join(broadcast(dimArtist.select(col("dim_artist_id"),
        col("artist_name").as("__an"))),
        col("artist_name") === col("__an"), "left")
      .join(broadcast(dimTrack.select(col("dim_track_id"),
        col("track_name").as("__tn"))),
        col("track_name") === col("__tn"), "left")
      // C2: user join on the natural key, right side pruned (B5 is free
      // under Catalyst column pruning but kept explicit for parity).
      .join(broadcast(dimUser.select(col("spotify_id"), col("dim_user_id"))),
        Seq("spotify_id"), "left")
      // B4: final projection in declared schema order; E2: coerce,
      // invalid timestamps → NULL (ANSI-safe try_ variant).
      .select(
        col("dim_platform_id"), col("dim_playlist_id"), col("dim_artist_id"),
        col("dim_track_id"), col("dim_user_id"),
        try_to_timestamp(col("added_at")).as("added_at"),
        col("is_local"))
  }
}
