"""Structured Streaming + multimodal plumbing tests."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from aiports_data_warehouse_etl_spark import schemas
from aiports_data_warehouse_etl_spark.operators.multimodal import (
    decode_and_featurize,
    resize_images,
    sample_video_frames,
)
from aiports_data_warehouse_etl_spark.sources.io import read_testdata
from aiports_data_warehouse_etl_spark.streaming.events import (
    stream_tumbling_counts,
    tumbling_window_agg,
)


def test_stream_matches_batch(spark, sf_small, tmp_path):
    """availableNow streaming over the events parquet must converge to
    exactly the batch tumbling aggregation."""
    events = read_testdata(spark, sf_small, "events")
    # stage the events as a normal-timestamp parquet dir (the raw file
    # is TIMESTAMP(NANOS), which the streaming file source also rejects)
    src = str(tmp_path / "events_src")
    events.write.parquet(src)

    batch = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in tumbling_window_agg(spark.read.parquet(src), "1 hour").collect()
    }

    q = stream_tumbling_counts(
        spark, src, str(tmp_path / "ckpt"), window="1 hour", query_name="t_evt"
    )
    q.awaitTermination(120)
    streamed = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM t_evt").collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_sliding_stream_matches_batch(spark, sf_small, tmp_path):
    """Hopping windows (1h length, 15m slide) under availableNow
    streaming + watermark must converge to the batch twin — every event
    in all 4 overlapping windows."""
    events = read_testdata(spark, sf_small, "events")
    src = str(tmp_path / "events_src")
    events.write.parquet(src)

    batch = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in tumbling_window_agg(
            spark.read.parquet(src), "1 hour", slide="15 minutes"
        ).collect()
    }

    q = stream_tumbling_counts(
        spark, src, str(tmp_path / "ckpt"), window="1 hour",
        slide="15 minutes", query_name="s_evt",
    )
    q.awaitTermination(120)
    streamed = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM s_evt").collect()
    }
    assert streamed == batch
    # 15m hops ⇒ ~4× the distinct window starts of the 1h tumbling agg
    tumbling_starts = {
        r.window_start
        for r in tumbling_window_agg(spark.read.parquet(src), "1 hour").collect()
    }
    assert len({ws for ws, _ in streamed}) > 2 * len(tumbling_starts)


def _real_media_rows():
    """Real PNG / PPM / WAV payloads with KNOWN pixel/sample content."""
    import numpy as np

    from aiports_data_warehouse_etl_spark.functions import mediacodec as mc

    # 4x4 gray PNG: all pixels 100 except one 200
    img = np.full((4, 4, 1), 100, dtype=np.uint8)
    img[0, 0, 0] = 200
    png = mc.encode_png(img)
    # 2x3 RGB PPM, constant red
    red = np.zeros((2, 3, 3), dtype=np.uint8)
    red[:, :, 0] = 255
    ppm = mc.encode_ppm(red)
    # 1s of silence + a step, PCM16 8kHz
    sig = np.concatenate(
        [np.zeros(400, dtype=np.int16), np.full(400, 1000, dtype=np.int16)]
    )
    wav = mc.encode_wav(sig, 8000)
    # 10-frame 4x4 Y4M at 5 fps (2000ms): frame i is constant luma 10*i
    vid = np.stack(
        [np.full((4, 4), 10 * i, dtype=np.uint8) for i in range(10)]
    )
    y4m = mc.encode_y4m(vid, 5, 1)
    # flat-128 16x16 baseline JPEG (own T.81 codec): exactly lossless
    from aiports_data_warehouse_etl_spark.functions.jpegcodec import encode_jpeg

    jpg = encode_jpeg(np.full((16, 16), 128, dtype=np.uint8), quality=90)
    return [
        (0, "image", png, "image/png", 4, 4, None, None),
        (1, "audio", wav, "audio/wav", None, None, 100, 8000),
        (2, "video", b"\x10\x20", "video/mp4", 640, 480, 3500, None),
        (3, "image", None, "image/png", 1, 1, None, None),
        (4, "image", ppm, "image/x-portable-pixmap", 3, 2, None, None),
        (5, "image", b"\x00\x01\x02\x03" * 8, "application/octet-stream",
         None, None, None, None),
        (6, "video", y4m, "video/x-yuv4mpeg", 4, 4, 2000, None),
        (7, "image", jpg, "image/jpeg", 16, 16, None, None),
    ]


@pytest.fixture()
def media(spark):
    return spark.createDataFrame(_real_media_rows(), schemas.MEDIA)


def test_decode_and_featurize_real_pixels(media):
    out = {r.media_id: r for r in decode_and_featurize(media).collect()}
    # PNG: real per-pixel stats — mean of (15*100 + 200)/16 = 106.25
    png = out[0]
    assert png.fmt == "png" and (png.width, png.height) == (4, 4)
    assert abs(png.sig_mean - 106.25) < 1e-9
    assert png.sig_std > 0
    # 8-bin histogram over [0,256): 15/16 px in bin 3 (96-128), 1 in bin 6
    assert abs(png.feature[3] - 15 / 16) < 1e-6
    assert abs(png.feature[6] - 1 / 16) < 1e-6
    # WAV: real per-sample stats — mean of half zeros, half 1000 = 500
    wav = out[1]
    assert wav.fmt == "wav" and wav.n_samples == 800 and wav.sample_rate == 8000
    assert abs(wav.sig_mean - 500.0) < 1e-9
    # PPM: pure red — luma = 0.299*255
    ppm = out[4]
    assert ppm.fmt == "ppm" and (ppm.width, ppm.height) == (3, 2)
    assert abs(ppm.sig_mean - 0.299 * 255) < 1e-6 and ppm.sig_std == 0.0
    # undecodable bytes fall back to byte-level features, honestly labelled
    raw = out[5]
    assert raw.fmt == "raw" and raw.width is None
    assert abs(sum(raw.feature) - 1.0) < 1e-5
    # video payload is not a decodable still format -> raw fallback
    assert out[2].fmt == "raw"
    # null payload
    assert out[3].feature is None and out[3].n_bytes is None
    # JPEG: flat 128 image decodes losslessly through the T.81 codec
    jpg = out[7]
    assert jpg.fmt == "jpeg" and (jpg.width, jpg.height) == (16, 16)
    assert abs(jpg.sig_mean - 128.0) < 1e-9 and jpg.sig_std == 0.0


def test_resize_images_real(media):
    from aiports_data_warehouse_etl_spark.functions import mediacodec as mc

    out = {r.media_id: r for r in resize_images(media, 2, 2).collect()}
    # only kind == image rows flow through
    assert set(out) == {0, 3, 4, 5, 7}
    small = mc.decode_png(bytes(out[0].payload))
    assert small.shape == (2, 2, 1)
    # nearest-neighbour of the 4x4 gray: top-left keeps the 200 pixel
    assert small[0, 0, 0] == 200 and small[1, 1, 0] == 100
    red = mc.decode_ppm(bytes(out[4].payload))
    assert red.shape == (2, 2, 3) and red[:, :, 0].min() == 255
    # undecodable / null payloads yield honest null rows
    assert out[3].payload is None and out[5].payload is None
    # JPEG resize re-encodes in the same format via the T.81 codec;
    # the flat-128 source stays flat through resample + requantize
    jsmall = mc.decode_image(bytes(out[7].payload))
    assert out[7].fmt == "jpeg" and jsmall.shape == (2, 2, 1)
    assert int(jsmall.max()) == 128 and int(jsmall.min()) == 128


def test_video_frame_sampling(media):
    rows = sample_video_frames(media, every_ms=1000).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)

    # undecodable mp4 (3500ms): metadata-only offset grid, null stats
    mp4 = sorted(by_media[2], key=lambda r: r.frame_offset_ms)
    assert [r.frame_offset_ms for r in mp4] == [0, 1000, 2000, 3000]
    assert all(r.frame_idx is None and r.mean_luma is None for r in mp4)

    # Y4M (10 frames @ 5fps = 200ms/frame): 1000ms step → every 5th
    # frame, REAL decoded luma (frame i is constant 10*i)
    y4m = sorted(by_media[6], key=lambda r: r.frame_offset_ms)
    assert [(r.frame_idx, r.frame_offset_ms) for r in y4m] == [(0, 0), (5, 1000)]
    assert [r.mean_luma for r in y4m] == [0.0, 50.0]
    assert all(r.std_luma == 0.0 for r in y4m)


def test_decode_and_featurize_y4m(media):
    out = {r.media_id: r for r in decode_and_featurize(media).collect()}
    v = out[6]
    assert v.fmt == "y4m" and (v.width, v.height) == (4, 4)
    assert v.n_samples == 10 and v.sample_rate == 5
    # mean luma over all frames: mean of 0,10,...,90 = 45
    assert abs(v.sig_mean - 45.0) < 1e-9 and v.sig_std > 0


def test_stateful_user_activity(spark, sf_small, tmp_path):
    from aiports_data_warehouse_etl_spark.streaming.events import (
        user_activity_state_stream,
    )

    events = read_testdata(spark, sf_small, "events")
    src = str(tmp_path / "evt_state_src")
    events.write.parquet(src)

    q = user_activity_state_stream(
        spark, src, str(tmp_path / "state_ckpt"), query_name="ua_test"
    )
    q.awaitTermination(180)
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql(
            "SELECT user_id, max(n_events) AS n_events, max(total_value) AS total_value "
            "FROM ua_test GROUP BY user_id"
        ).collect()
    }
    expected = {
        r.user_id: (r.n, round(r.total, 2))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == expected


def test_incremental_load_stream(spark, sf_small, tmp_path):
    """Delta dir → foreachBatch warehouse append, incremental across
    restarts: the second run loads ONLY files that arrived after the
    first (the reference's dataset-trigger semantics)."""
    from aiports_data_warehouse_etl_spark.streaming.events import (
        incremental_load_stream,
    )

    nation = spark.read.parquet(f"{sf_small}/nation.parquet")
    delta_dir = str(tmp_path / "delta")
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")

    nation.filter("n_nationkey < 10").write.mode("append").parquet(delta_dir)
    q = incremental_load_stream(spark, delta_dir, wh, ckpt)
    q.awaitTermination(60)
    assert spark.read.parquet(wh).count() == 10

    # new delta arrives; restart with the SAME checkpoint → only new rows load
    nation.filter("n_nationkey >= 10").write.mode("append").parquet(delta_dir)
    q2 = incremental_load_stream(spark, delta_dir, wh, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(wh).count() == 25  # not 35: first batch not re-loaded


def test_stream_stream_join_matches_batch(spark, sf_small, tmp_path):
    from aiports_data_warehouse_etl_spark.streaming.events import (
        stream_purchase_attribution,
    )

    events = read_testdata(spark, sf_small, "events")
    src = str(tmp_path / "attr_src")
    events.write.parquet(src)

    q = stream_purchase_attribution(spark, src, str(tmp_path / "attr_ck"), "attr_t")
    q.awaitTermination(120)
    streamed = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM attr_t").collect()
    }

    e = spark.read.parquet(src)
    p = e.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    c = e.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    batch = {
        (r.purchase_id, r.click_id)
        for r in p.join(
            c,
            (F.col("cu") == F.col("pu"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("cts") < F.col("pts")),
        ).collect()
    }
    assert streamed == batch
    assert len(batch) > 0


def test_incremental_aggregate_maintenance(spark, sf_small, tmp_path):
    from aiports_data_warehouse_etl_spark.streaming.events import (
        incremental_aggregate_maintenance,
    )

    events = read_testdata(spark, sf_small, "events")
    src = str(tmp_path / "iam_src")
    agg_path = str(tmp_path / "agg_table")
    events.filter("event_id < 500").write.mode("append").parquet(src)

    q = incremental_aggregate_maintenance(spark, src, agg_path, str(tmp_path / "iam_ck"))
    q.awaitTermination(120)
    first = spark.read.parquet(agg_path)
    assert first.agg(F.sum("n_events")).collect()[0][0] == 500

    # more events arrive; same checkpoint → only the delta merges in
    events.filter("event_id >= 500").write.mode("append").parquet(src)
    q2 = incremental_aggregate_maintenance(spark, src, agg_path, str(tmp_path / "iam_ck"))
    q2.awaitTermination(120)
    final = spark.read.parquet(agg_path)

    expected = {
        (r.user_id, r.event_type): (r.n, round(r.s, 2))
        for r in events.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    }
    got = {
        (r.user_id, r.event_type): (r.n_events, r.sum_value) for r in final.collect()
    }
    assert got == expected


def test_stream_dedup_events(spark, sf_small, tmp_path):
    from aiports_data_warehouse_etl_spark.streaming.events import stream_dedup_events

    events = read_testdata(spark, sf_small, "events").filter("event_id < 200")
    src = str(tmp_path / "dedup_src")
    # simulate at-least-once delivery: every event written twice
    events.write.mode("append").parquet(src)
    events.write.mode("append").parquet(src)
    assert spark.read.parquet(src).count() == 400

    q = stream_dedup_events(spark, src, str(tmp_path / "dedup_ck"), "dedup_t")
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dedup_t")
    assert out.count() == 200  # duplicates collapsed
    assert out.select("event_id").distinct().count() == 200


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode watermark semantics across incremental (availableNow)
    restarts: a window is emitted once the watermark passes its end, and
    an event arriving LATER than the watermark for that closed window is
    dropped — while an in-watermark arrival still counts. This is the
    contract that bounds state at 100 TB."""
    import datetime as dt

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    def run_stream():
        stream = (
            spark.readStream.schema(schema)
            .parquet(src)
            .withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"), "n")
        )
        q = (
            stream.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)
    # batch A: two events in the 08h window; 10:45 pushes the watermark
    # to 10:15, closing (emitting) the 08h window
    write_batch([(1, t(8, 10), 1, "c", 1.0), (2, t(8, 20), 1, "c", 1.0),
                 (3, t(10, 45), 1, "c", 1.0)])
    run_stream()
    # batch B: 08:30 is LATE (behind the 10:15 watermark, its window
    # closed) → dropped; 10:50 is within watermark → counts; 11:50
    # advances the watermark to 11:20, closing the 10h window
    write_batch([(4, t(8, 30), 1, "c", 1.0), (5, t(10, 50), 1, "c", 1.0),
                 (6, t(11, 50), 1, "c", 1.0)])
    run_stream()

    got = {r.window_start.hour: r.n for r in spark.read.parquet(out).collect()}
    assert got[8] == 2        # late 08:30 event did NOT land
    assert got[10] == 2       # 10:45 (state) + in-watermark 10:50
    assert spark.read.parquet(out).groupBy("window_start").count().filter(
        F.col("count") > 1).count() == 0  # each window emitted exactly once


def test_transform_with_state_running_stats(spark, sf_small, tmp_path):
    """transformWithStateInPandas (Spark 4 typed-state API): per-user
    running stats match the batch groupBy ground truth.

    The TWS python driver worker speaks protobuf to the JVM — skip
    when google.protobuf is absent (this container); the
    applyInPandasWithState twin (test_stateful_user_activity) covers
    the same semantics on the older API."""
    pytest.importorskip("google.protobuf")
    from aiports_data_warehouse_etl_spark.streaming.events import (
        user_stats_tws_stream,
    )

    events = read_testdata(spark, sf_small, "events")
    src = str(tmp_path / "tws_src")
    events.write.parquet(src)

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    q = user_stats_tws_stream(
        spark, src, str(tmp_path / "tws_ckpt"), query_name="tws_test"
    )
    q.awaitTermination(180)
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql(
            "SELECT user_id, max(n_events) AS n_events, max(total_value) AS total_value "
            "FROM tws_test GROUP BY user_id"
        ).collect()
    }
    expected = {
        r.user_id: (r.n, round(r.total, 2))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == expected
    if old is not None:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)


def test_chained_stateful_stream_matches_batch(spark, sf_small, tmp_path):
    """Stream-stream join + downstream windowed agg as ONE streaming
    query (chained stateful operators) produces the same hourly
    attributed-revenue table as the batch twin."""
    from aiports_data_warehouse_etl_spark.streaming.events import (
        stream_attributed_revenue,
    )

    events = read_testdata(spark, sf_small, "events")
    src = str(tmp_path / "chain_src")
    events.write.parquet(src)

    q = stream_attributed_revenue(spark, src, str(tmp_path / "chain_ck"), "chain_t")
    q.awaitTermination(120)
    streamed = {
        (r.hour_start, r.n_attributed_pairs, r.attributed_value)
        for r in spark.sql("SELECT * FROM chain_t").collect()
    }

    e = spark.read.parquet(src)
    p = e.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"),
        F.col("value").alias("pv"),
    )
    c = e.filter("event_type = 'click'").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"),
    )
    batch = {
        (r.hour_start, r.n_attributed_pairs, r.attributed_value)
        for r in p.join(
            c,
            (F.col("cu") == F.col("pu"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("cts") < F.col("pts")),
        )
        .groupBy(F.window("pts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_attributed_pairs"),
            F.round(F.sum("pv"), 2).alias("attributed_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "n_attributed_pairs", "attributed_value")
        .collect()
    }
    assert streamed == batch
    assert len(batch) > 0


def test_stream_static_enrichment_matches_batch(spark, sf_small, tmp_path):
    """Stream-static broadcast join (events ⋈ customer→nation dim) under
    availableNow must equal the identical batch join+agg."""
    from aiports_data_warehouse_etl_spark.streaming.events import (
        stream_static_enrichment,
    )

    events = read_testdata(spark, sf_small, "events")
    src = str(tmp_path / "events_src")
    events.write.parquet(src)

    cust = read_testdata(spark, sf_small, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    nation = read_testdata(spark, sf_small, "nation").select(
        "n_nationkey", "n_name"
    )
    dim = cust.join(nation, cust.c_nationkey == nation.n_nationkey).select(
        "user_id", "n_name"
    )

    batch = {
        r.n_name: (r.n_events, r.sum_value)
        for r in spark.read.parquet(src)
        .join(dim, "user_id")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .collect()
    }

    q = stream_static_enrichment(
        spark, src, dim, str(tmp_path / "ckpt"), query_name="enr_evt"
    )
    q.awaitTermination(120)
    streamed = {
        r.n_name: (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM enr_evt").collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_binaryfile_source_feeds_multimodal_pipeline(spark, tmp_path):
    """format('binaryFile') is the ingestion path for raw media at
    scale: each file becomes (path, modificationTime, length, content)
    with content NEVER decoded JVM-side. The read must column-prune
    (length-only scans skip payload bytes) and the payload must flow
    into the mapInPandas featurizer unchanged."""
    import glob

    media_dir = tmp_path / "media"
    media_dir.mkdir()
    payloads = {f"img_{i:02d}.bin": bytes([i] * (100 + i)) for i in range(8)}
    for name, data in payloads.items():
        (media_dir / name).write_bytes(data)

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(str(media_dir))
    )
    assert {f.name for f in df.schema.fields} == {
        "path", "modificationTime", "length", "content"
    }
    got = {
        r.path.rsplit("/", 1)[-1]: (r.length, bytes(r.content))
        for r in df.collect()
    }
    assert got == {n: (len(d), d) for n, d in payloads.items()}

    # feed the binary payloads through the multimodal featurizer
    from pyspark.sql import Window

    media = df.select(
        F.row_number().over(Window.orderBy("path")).cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("content").alias("payload"),
    )
    feats = decode_and_featurize(media)
    rows = feats.collect()
    assert len(rows) == 8
    assert all(len(r.feature) == 8 for r in rows)
    assert all(abs(sum(r.feature) - 1.0) < 1e-4 for r in rows)


def test_read_testdata_normalizes_every_ts_encoding(spark, sf_small, tmp_path):
    """The driver's events.parquet has shipped with ts as
    TIMESTAMP(NANOS) and as TIMESTAMP_NTZ micros across testdata
    generations; plain TIMESTAMP must also survive. read_testdata must
    normalize all three to TimestampType with identical values."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime as dt

    base = [
        dt.datetime(2024, 1, 1, 0, 9, 58, 778549),
        dt.datetime(2024, 3, 5, 12, 0, 0, 1),
    ]
    ids = [1, 2]

    def write_variant(name, ts_type):
        d = tmp_path / name
        d.mkdir()
        tbl = pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(base).cast(ts_type),
            }
        )
        pq.write_table(tbl, str(d / "events.parquet"))
        return str(d)

    expect = {(i, t) for i, t in zip(ids, base)}
    for name, ts_type in [
        ("nanos", pa.timestamp("ns")),
        ("ntz_micros", pa.timestamp("us")),
        ("ltz_micros", pa.timestamp("us", tz="UTC")),
    ]:
        d = write_variant(name, ts_type)
        df = read_testdata(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", (name, df.dtypes)
        got = {(r.event_id, r.ts) for r in df.collect()}
        assert got == expect, name


def test_append_mode_watermark_drops_late_data(spark, tmp_path):
    """Append-mode + watermark semantics across a restart: run 1 closes
    and emits early windows; run 2 delivers a row for an already-closed
    window (later than the watermark) plus rows that close a newer
    window. The late row must be dropped — the closed window is never
    re-emitted — while the newly closed window appears exactly once."""
    import datetime as dt

    from aiports_data_warehouse_etl_spark.streaming.events import (
        stream_append_window_counts,
    )

    src = str(tmp_path / "late_src")
    out = str(tmp_path / "late_out")
    ckpt = str(tmp_path / "late_ckpt")
    schema = "ts timestamp, event_type string, value double"
    day = dt.datetime(2024, 6, 1)

    def ev(h, m):
        return (day + dt.timedelta(hours=h, minutes=m), "click", 1.0)

    def emitted():
        rows = spark.read.parquet(out).collect()
        return sorted((r.window_start.hour, r.n_events) for r in rows)

    # run 1: events 10:00..15:00 → watermark 14:00, windows 10..13 close
    batch1 = [ev(10, 0), ev(10, 20), ev(11, 5), ev(12, 5), ev(13, 5), ev(15, 0)]
    spark.createDataFrame(batch1, schema).write.mode("append").parquet(src)
    q1 = stream_append_window_counts(spark, src, out, ckpt)
    q1.awaitTermination(120)
    assert emitted() == [(10, 2), (11, 1), (12, 1), (13, 1)]

    # run 2: a LATE row for the closed 10:00 window + a 16:30 row that
    # advances the watermark past 15:00. Append mode emits a closed
    # window in the batch AFTER the watermark passes, so run 2's output
    # is unchanged — the key assertion is that the late 10:30 row does
    # NOT re-emit or grow the hour-10 window.
    batch2 = [ev(10, 30), ev(16, 30)]
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(src)
    q2 = stream_append_window_counts(spark, src, out, ckpt)
    q2.awaitTermination(120)
    assert emitted() == [(10, 2), (11, 1), (12, 1), (13, 1)]

    # run 3: another restart flushes the now-closed hour-15 window with
    # ONLY its on-time event; hour 10 still 2 — late row provably gone
    spark.createDataFrame([ev(17, 30)], schema).write.mode("append").parquet(src)
    q3 = stream_append_window_counts(spark, src, out, ckpt)
    q3.awaitTermination(120)
    assert emitted() == [(10, 2), (11, 1), (12, 1), (13, 1), (15, 1)]


def test_stream_left_outer_join_flushes_unmatched(spark, sf_small, tmp_path):
    """LEFT OUTER stream-stream join: matched purchases emit with their
    click; unmatched ones emit with a NULL click once a later batch
    advances the watermark past the join window — the flush happens on
    the restart over new data, exactly the documented semantics."""
    import datetime as dt

    from aiports_data_warehouse_etl_spark.streaming.events import (
        stream_unattributed_purchases,
    )

    events = read_testdata(spark, sf_small, "events")
    src = str(tmp_path / "unattr_src")
    ckpt = str(tmp_path / "unattr_ck")
    events.write.parquet(src)

    out = str(tmp_path / "unattr_out")
    q = stream_unattributed_purchases(spark, src, out, ckpt)
    q.awaitTermination(120)

    # sentinel batch far in the future advances BOTH sides' watermarks
    far = dt.datetime(2031, 1, 1)
    sentinel = spark.createDataFrame(
        [(10_000_001, 1, "purchase", far), (10_000_002, 1, "click", far)],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    cols = spark.read.parquet(src).columns
    for c in cols:
        if c not in sentinel.columns:
            sentinel = sentinel.withColumn(c, F.lit(None))
    sentinel.select(*cols).write.mode("append").parquet(src)

    q2 = stream_unattributed_purchases(spark, src, out, ckpt)
    q2.awaitTermination(120)
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.read.parquet(out).collect()
        if r.purchase_id < 10_000_000
    }

    e = spark.read.parquet(src).filter("event_id < 10000000")
    p = e.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    c = e.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    batch = {
        (r.purchase_id, r.click_id)
        for r in p.join(
            c,
            (F.col("cu") == F.col("pu"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("cts") < F.col("pts")),
            "left_outer",
        ).collect()
    }
    assert got == batch
    # the outer semantics actually exercised both arms
    assert any(c is None for _, c in batch)
    assert any(c is not None for _, c in batch)


def test_stream_session_windows_match_batch(spark, sf_small, tmp_path):
    """Streaming session windows (fixed AND dynamic per-event gap)
    converge to exactly the batch session_window aggregation."""
    from aiports_data_warehouse_etl_spark.streaming.events import (
        session_window_agg,
        stream_session_counts,
    )

    events = read_testdata(spark, sf_small, "events")
    src = str(tmp_path / "sess_src")
    events.write.parquet(src)

    def rows(df):
        return {
            (r.user_id, r.session_start): (r.n_events, r.sum_value)
            for r in df.collect()
        }

    # fixed 30-minute gap
    q = stream_session_counts(
        spark, src, str(tmp_path / "ck1"), gap="30 minutes",
        query_name="sess_fixed",
    )
    q.awaitTermination(120)
    batch = rows(session_window_agg(spark.read.parquet(src), "30 minutes"))
    streamed = rows(spark.sql("SELECT * FROM sess_fixed"))
    assert streamed == batch and len(batch) > 0

    # dynamic per-event gap (clicks 10 min, others 40)
    q2 = stream_session_counts(
        spark, src, str(tmp_path / "ck2"), query_name="sess_dyn",
        dynamic=True,
    )
    q2.awaitTermination(120)
    gap = F.when(F.col("event_type") == "click", F.lit("10 minutes")).otherwise(
        F.lit("40 minutes")
    )
    batch_dyn = rows(
        spark.read.parquet(src)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id", F.col("w.start").alias("session_start"),
            "n_events", "sum_value",
        )
    )
    streamed_dyn = rows(spark.sql("SELECT * FROM sess_dyn"))
    assert streamed_dyn == batch_dyn
    # dynamic gaps genuinely change the sessionization
    assert streamed_dyn != streamed


def test_downsample_audio_real_samples(media):
    import numpy as np

    from aiports_data_warehouse_etl_spark.functions import mediacodec as mc
    from aiports_data_warehouse_etl_spark.operators.multimodal import (
        downsample_audio,
    )

    out = {r.media_id: r for r in downsample_audio(media, factor=2).collect()}
    # only the audio row flows through
    assert set(out) == {1}
    a = out[1]
    assert a.sample_rate == 4000 and a.n_samples == 400
    dec, rate = mc.decode_wav(bytes(a.payload))
    assert rate == 4000 and dec.shape[0] == 400
    # decimation == stride slice of the original signal
    orig = np.concatenate(
        [np.zeros(400, dtype=np.int16), np.full(400, 1000, dtype=np.int16)]
    )
    assert np.array_equal(dec.ravel(), orig[::2].astype(np.int32))


def test_stateful_restart_resumes_100k_keys(spark, tmp_path):
    """Checkpoint-restart at ~100k state keys (VERDICT r3 #8): a second
    query started on the SAME checkpoint resumes from the RocksDB
    state snapshot + committed source offsets — processing ONLY the
    files that arrived after the first run (one update row per key,
    no reprocessing) and carrying every key's accumulator forward
    (n_events doubles instead of resetting)."""
    from aiports_data_warehouse_etl_spark.streaming.events import (
        user_stats_restartable_stream,
    )

    n_keys = 100_000
    src = str(tmp_path / "restart_src")
    ckpt = str(tmp_path / "restart_ckpt")
    out = str(tmp_path / "restart_out")

    b1 = spark.range(2 * n_keys).select(
        (F.col("id") % n_keys).alias("user_id"),
        ((F.col("id") % n_keys).cast("double") * 1.0).alias("value"),
    )
    b1.coalesce(4).write.mode("append").parquet(src)

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    q1 = user_stats_restartable_stream(spark, src, ckpt, out)
    assert q1.awaitTermination(600), "first run did not terminate"

    run1 = spark.read.parquet(out)
    run1_rows = run1.count()
    assert run1_rows == n_keys  # one update row per key
    max_batch_1 = run1.agg(F.max("batch_id")).collect()[0][0]

    # second wave of files lands AFTER the first query terminated
    b2 = spark.range(2 * n_keys).select(
        (F.col("id") % n_keys).alias("user_id"),
        ((F.col("id") % n_keys).cast("double") * 2.0).alias("value"),
    )
    b2.coalesce(4).write.mode("append").parquet(src)

    q2 = user_stats_restartable_stream(spark, src, ckpt, out)
    assert q2.awaitTermination(600), "restarted run did not terminate"

    allout = spark.read.parquet(out)
    new = allout.filter(F.col("batch_id") > max_batch_1)
    # no reprocessing: exactly one update row per key for the new files
    assert new.count() == n_keys
    # state carried forward: every key's count is 4 (2 + 2), never 2
    bad = new.filter(F.col("n_events") != 4).count()
    assert bad == 0, f"{bad} keys lost state across restart"
    # totals: per key value*1.0*2 + value*2.0*2 = key*6.0
    wrong = new.filter(
        F.abs(F.col("total_value") - F.col("user_id") * 6.0) > 1e-6
    ).count()
    assert wrong == 0
    if old is not None:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
