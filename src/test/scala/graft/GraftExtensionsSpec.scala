package graft

class GraftExtensionsSpec extends SparkTestBase {

  test("custom expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val dot = spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(dot == 11.0)

    val h = spark.sql("SELECT md5_hash32('0:the cat') AS h").collect().head.getLong(0)
    val reference = spark.sql(
      "SELECT CAST(conv(substring(md5('0:the cat'), 1, 8), 16, 10) AS BIGINT) AS h")
      .collect().head.getLong(0)
    assert(h == reference, "md5_hash32 must equal the portable SQL definition")

    val shingles = spark.sql("SELECT shingle_set('a b c d', 3) AS s")
      .collect().head.getAs[collection.Seq[String]](0)
    assert(shingles.toList == List("a b c", "b c d"))
  }

  test("minhash_sig from SQL equals the operator's signature array") {
    import org.apache.spark.sql.functions.col
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT minhash_sig(shingle_set('alpha beta gamma delta epsilon', 3), 16) AS sig")
      .collect().head.getAs[collection.Seq[Long]](0)
    import spark.implicits._
    val viaOp = graft.ext.Dedup.minhashSignatureArray(
      Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text"))
      .select(col("sig")).collect().head.getAs[collection.Seq[Long]](0)
    assert(viaSql.toList == viaOp.toList)
    assert(viaSql.length == 16 && viaSql.forall(_ < graft.functions.Hashing.MinhashPrime))
  }

  test("heavy_hitters registers as a SQL UDAF and finds the dominant token") {
    GraftFunctions.registerHeavyHitters(spark, "heavy_hitters", k = 5)
    import spark.implicits._
    val tokens = (1 to 900).map(i => if (i % 3 == 0) "big" else s"t${i % 40}")
    tokens.toDF("token").createOrReplaceTempView("hh_tokens")
    val out = spark.sql("SELECT heavy_hitters(token) AS hh FROM hh_tokens")
      .collect().head.getAs[collection.Seq[org.apache.spark.sql.Row]](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.contains("big"), s"dominant token missing from $out")
    assert(out("big") <= 300L && out("big") >= 300L - 900L / 6)
  }

  test("image_meta decodes PNG bytes from SQL") {
    GraftFunctions.register(spark)
    val img = new java.awt.image.BufferedImage(2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xffffff)
    img.setRGB(1, 0, 0x000000)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    import spark.implicits._
    Seq(Tuple1(out.toByteArray)).toDF("payload").createOrReplaceTempView("im_t")
    val r = spark.sql(
      "SELECT image_meta(payload).width w, image_meta(payload).height h, " +
        "image_meta(payload).mean_pixel_ppm p FROM im_t").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L)
    assert(r.getLong(2) == 500000L) // (765 + 0) * 1e6 / (3*255*2)
  }

  test("shingle_set rejects a non-literal size") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_set('a b c', length('xx'))").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("audio_meta decodes WAV bytes from SQL") {
    GraftFunctions.register(spark)
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](4000 * 2)), fmt, 4000L)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    import spark.implicits._
    Seq(Tuple1(out.toByteArray)).toDF("payload").createOrReplaceTempView("au_t")
    val r = spark.sql(
      "SELECT audio_meta(payload).duration_ms d, audio_meta(payload).sample_rate_hz s, " +
        "audio_meta(payload).channels c FROM au_t").collect().head
    assert(r.getLong(0) == 500L && r.getLong(1) == 8000L && r.getLong(2) == 1L)
  }

  test("video_meta decodes MP4 container bytes from SQL") {
    GraftFunctions.register(spark)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(payload.length + 8)
      b.putInt(payload.length + 8).put(tpe.getBytes("ISO-8859-1")).put(payload)
      b.array()
    }
    val mvhd = java.nio.ByteBuffer.allocate(100)
      .putInt(0).putInt(0).putInt(0).putInt(600).putInt(1500).array()
    val mp4 = box("ftyp", "isom   isom".getBytes("ISO-8859-1")) ++
      box("moov", box("mvhd", mvhd))
    import spark.implicits._
    Seq(Tuple1(mp4)).toDF("payload").createOrReplaceTempView("vid_t")
    val r = spark.sql(
      "SELECT video_meta(payload).duration_ms d, video_meta(payload).timescale_hz t " +
        "FROM vid_t").collect().head
    assert(r.getLong(0) == 2500L && r.getLong(1) == 600L) // 1500/600 s = 2500 ms
  }

  test("video_keyframe_ranges and image_resize_meta work from SQL") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // MJPEG container: its sync-sample ranges and a decodable keyframe
    Seq(Tuple1(graft.ext.Bmff.syntheticMjpeg(3L))).toDF("payload")
      .createOrReplaceTempView("mj_t")
    val kf = spark.sql(
      "SELECT size(video_keyframe_ranges(payload)) n, " +
        "video_keyframe_ranges(payload)[0].kf_bytes b FROM mj_t").collect().head
    assert(kf.getInt(0) == 2 && kf.getLong(1) > 600L) // 4 frames, odd-k sync; real JPEG sizes
    // PNG gradient through the SQL resize, pinned to the operator path
    Seq(Tuple1(graft.ext.Png.syntheticGradient(5L))).toDF("payload")
      .createOrReplaceTempView("rz_t")
    val viaSql = spark.sql(
      "SELECT image_resize_meta(payload, 8).rw, image_resize_meta(payload, 8).rh, " +
        "image_resize_meta(payload, 8).mean_pixel_ppm FROM rz_t").collect().head
    val viaOp = Seq(Tuple1(graft.ext.Png.syntheticGradient(5L))).toDF("payload")
      .select(graft.ext.Multimodal.resizeMeta(org.apache.spark.sql.functions.col("payload"),
        target = 8).as("m"))
      .select("m.rw", "m.rh", "m.mean_pixel_ppm").collect().head
    assert(viaSql == viaOp)
  }

  test("SQL builders reject wrong arity by function name, never IndexOutOfBounds") {
    GraftFunctions.register(spark)
    val cases = Seq(
      "SELECT md5_hash32('a', 'b')" -> "md5_hash32",
      "SELECT md5_hash32()" -> "md5_hash32",
      "SELECT dot_product(array(1.0D))" -> "dot_product",
      "SELECT shingle_set('a b c')" -> "shingle_set",
      "SELECT minhash_sig(shingle_set('a b c', 2))" -> "minhash_sig",
      "SELECT image_meta()" -> "image_meta",
      "SELECT audio_meta(CAST('x' AS BINARY), 1)" -> "audio_meta",
      "SELECT video_meta()" -> "video_meta")
    for ((sql, fn) <- cases) {
      val e = intercept[Exception] { spark.sql(sql).collect() }
      assert(e.getMessage.contains(fn) && e.getMessage.contains("expects"),
        s"$sql must fail naming $fn: ${e.getMessage.take(200)}")
      assert(!e.getMessage.contains("IndexOutOfBounds"))
    }
  }
}
