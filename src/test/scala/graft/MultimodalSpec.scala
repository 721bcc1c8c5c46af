package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructType}

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends GraftSuite {

  private lazy val media = Multimodal.mediaTable(Tables.documents(spark, sf))
  private lazy val typed = Multimodal.asMediaRows(media)

  test("media table: opaque binary payload + typed metadata struct") {
    val schema = media.schema
    assert(schema("payload").dataType === BinaryType)
    assert(schema("meta").dataType.isInstanceOf[StructType])
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  test("decode emits one row per media with stable content hash") {
    val out = Multimodal.decode(typed)
    assert(out.count() === media.count())
    // deterministic: same input -> same hash
    val h1 = out.orderBy("media_id").select("content_hash").first().getString(0)
    val h2 = Multimodal.decode(typed)
      .orderBy("media_id").select("content_hash").first().getString(0)
    assert(h1 === h2)
  }

  test("feature extraction yields fixed-width vectors in [0,1]") {
    val fs = Multimodal.extractFeatures(typed, dim = 8).collect()
    assert(fs.nonEmpty)
    assert(fs.forall(_.features.length == 8))
    assert(fs.forall(_.features.forall(v => v >= 0.0 && v <= 1.0)))
  }

  test("frame sampling fans out only videos, capped at maxFrames") {
    val frames = Multimodal.sampleFrames(typed, maxFrames = 5).toDF()
    val videoIds = media.filter(col("kind") === "video")
      .select("media_id").collect().map(_.getLong(0)).toSet
    val sampledIds = frames.select("media_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(sampledIds.subsetOf(videoIds))
    val perMedia = frames.groupBy("media_id").count()
      .agg(max("count")).first().getLong(0)
    assert(perMedia <= 5)
  }

  test("resize touches only images and stamps the new dimensions") {
    val out = Multimodal.resize(typed, 128, 128).toDF()
    assert(out.select("kind").distinct().collect().map(_.getString(0)).toSeq
      === Seq("image"))
    assert(out.filter(col("width") =!= 128 || col("height") =!= 128).count() === 0)
  }
}
