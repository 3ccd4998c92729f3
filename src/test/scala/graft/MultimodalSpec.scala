package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("media table carries opaque binary payloads with typed metadata") {
    val m = Multimodal.mediaTable(spark, sf)
    assert(m.schema("payload").dataType.typeName == "binary")
    val row = m.head()
    assert(row.payload.nonEmpty && row.width >= 16 && Set("png", "jpg", "webp")(row.fmt))
  }

  test("batched decode produces one feature row per media record, partition-local") {
    val m = Multimodal.mediaTable(spark, sf).repartition(7)
    val f = Multimodal.decodeFeatures(m)
    assert(f.count() == m.count())
    // features bounded by byte-value range (fake decoder = chunk means)
    val bad = f.filter(col("f0") < 0 || col("f0") > 255 || col("f3") < 0 || col("f3") > 255).count()
    assert(bad == 0)
  }

  test("decoder seam: an alternate decoder runs through identical plumbing") {
    import graft.multimodal.Multimodal.{MediaFeatures, MediaRecord}
    // trivial alternate decoder: features = byte-length histogram-ish
    // constants — proves decodeFeatures is decoder-agnostic and the
    // fake is swappable without touching the pipeline
    val alt: Multimodal.Decoder = (m: MediaRecord) =>
      MediaFeatures(m.doc_id, m.fmt, m.payload.length,
        m.payload.length.toDouble, 0.0, 1.0, 2.0)
    val media = Multimodal.mediaTable(spark, sf).repartition(5)
    val fake = Multimodal.decodeFeatures(media).collect()
    val other = Multimodal.decodeFeatures(media, alt).collect()
    // same rows out, same ids/fmt/byte counts — only feature values differ
    assert(other.length == fake.length)
    val fk = fake.map(f => f.doc_id -> ((f.fmt, f.n_bytes))).toMap
    assert(other.forall(o => fk(o.doc_id) == ((o.fmt, o.n_bytes))))
    assert(other.forall(o => o.f0 == o.n_bytes.toDouble && o.f3 == 2.0))
  }

  test("frame sampling emits stride-filtered frames covering the payload") {
    val frames = Multimodal.sampleFrames(Multimodal.mediaTable(spark, sf))
    val perDoc = frames.groupBy("doc_id").count().select("count").distinct().collect()
    assert(perDoc.map(_.getLong(0)).toSet == Set(4L)) // 8 frames, stride 2
    val neg = frames.filter(col("frame_len") < 0).count()
    assert(neg == 0)
  }
}
