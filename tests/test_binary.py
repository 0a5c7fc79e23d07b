"""Arrow-IPC binary frame serialization round-trip (SURVEY §2.1 S8)."""

import pytest
from pyspark.sql import functions as F

from promi_spark.io import load_table
from promi_spark.io.binary import (
    from_arrow_frames,
    read_arrow_frames,
    to_arrow_frames,
    write_arrow_frames,
)

SF = "/root/testdata/sf0.001"


def test_frames_round_trip_counts_and_content(spark):
    df = load_table(spark, "events", SF)
    frames = to_arrow_frames(df)
    got = from_arrow_frames(frames, df.schema)
    assert got.schema == df.schema
    assert got.count() == df.count()
    # content equality, order-insensitive
    a = df.orderBy("event_id").collect()
    b = got.orderBy("event_id").collect()
    assert a == b


def test_frames_row_count_column(spark):
    df = load_table(spark, "nation", SF)
    total = to_arrow_frames(df).agg(F.sum("n_rows")).first()[0]
    assert total == df.count()


def test_frames_persist_round_trip(spark, tmp_path):
    df = load_table(spark, "region", SF)
    p = str(tmp_path / "frames")
    write_arrow_frames(df, p)
    got = read_arrow_frames(spark, p, df.schema)
    assert sorted(r["r_name"] for r in got.collect()) == sorted(
        r["r_name"] for r in df.collect()
    )


def test_avro_frames_execute(spark):
    """The Avro wire path executes in THIS container: with spark-avro
    absent, to_avro_frames falls back to the pure-Python datum codec
    (r9 verdict gap — the path was written but never executed here)."""
    from promi_spark.io.binary import to_avro_frames

    df = load_table(spark, "region", SF)
    out = to_avro_frames(df)
    assert out.columns == ["value"]
    assert out.count() == df.count()
    blobs = [r["value"] for r in out.collect()]
    assert all(isinstance(b, (bytes, bytearray)) and len(b) > 0 for b in blobs)


def test_avro_codec_spec_vectors():
    """Zigzag-varint vectors straight from the Avro spec's binary
    encoding table — the codec's ground truth, no engine involved."""
    from promi_spark.io.avro_codec import _dec_long, _enc_long

    for v, want in [
        (0, b"\x00"),
        (-1, b"\x01"),
        (1, b"\x02"),
        (-2, b"\x03"),
        (2, b"\x04"),
        (-64, b"\x7f"),
        (64, b"\x80\x01"),
    ]:
        out = bytearray()
        _enc_long(out, v)
        assert bytes(out) == want, v
        back, pos = _dec_long(bytes(out), 0)
        assert back == v and pos == len(out)


def test_avro_codec_reference_jar_parity(spark):
    """Byte-level parity with the Apache Avro REFERENCE implementation:
    the avro-1.12.1 jar on Spark's classpath (a core Spark dependency)
    encodes/decodes the same record schema via py4j. Python-encoded
    datums decode JVM-side to the same values; JVM-encoded datums are
    byte-identical to Python's and decode back losslessly. This pins
    that fallback frames are readable by ANY Avro consumer — including
    spark-avro's from_avro on a real cluster."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from promi_spark.io.avro_codec import row_decoder, row_encoder
    from promi_spark.io.binary import avro_schema_json

    schema = StructType(
        [
            StructField("a", LongType(), True),
            StructField("s", StringType(), True),
            StructField("d", DoubleType(), False),
        ]
    )
    rows = [(5, "héllo", 3.25), (None, None, -1.5), (-(2**40), "", 0.0)]
    enc, dec = row_encoder(schema), row_decoder(schema)

    jvm = spark._jvm
    jschema = jvm.org.apache.avro.Schema.Parser().parse(
        avro_schema_json(schema)
    )
    reader = jvm.org.apache.avro.generic.GenericDatumReader(jschema)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(jschema)
    factory_d = jvm.org.apache.avro.io.DecoderFactory.get()
    factory_e = jvm.org.apache.avro.io.EncoderFactory.get()

    for row in rows:
        py_bytes = enc(row)

        # Python bytes -> JVM reference decoder
        jdec = factory_d.binaryDecoder(py_bytes, None)
        rec = reader.read(None, jdec)
        got_a = rec.get("a")
        got_s = rec.get("s")
        got_d = rec.get("d")
        assert (got_a if got_a is None else int(got_a)) == row[0]
        assert (got_s if got_s is None else got_s.toString()) == row[1]
        assert float(got_d) == row[2]

        # JVM reference encoder -> byte-identical to Python's: re-encode
        # the record the JVM itself just decoded (py4j would box small
        # Python ints as Integer, which Avro unions reject — the decoded
        # record carries the correctly-typed Java values)
        baos = jvm.java.io.ByteArrayOutputStream()
        jenc = factory_e.binaryEncoder(baos, None)
        writer.write(rec, jenc)
        jenc.flush()
        jvm_bytes = bytes(baos.toByteArray())
        assert jvm_bytes == py_bytes, row
        assert dec(jvm_bytes) == row


def test_frames_stream_kafka_shape(spark, tmp_path):
    """The Kafka integration shape without Kafka: frames land as files,
    a stream reads the binary payloads, foreachBatch decodes them with
    from_arrow_frames and appends typed rows — counts match the source."""
    from promi_spark.io.binary import from_arrow_frames, write_arrow_frames

    df = load_table(spark, "events", SF)
    frames_dir = str(tmp_path / "frames")
    out_dir = str(tmp_path / "decoded")
    ckpt = str(tmp_path / "ckpt")
    write_arrow_frames(df, frames_dir)

    frames_schema = spark.read.parquet(frames_dir).schema
    stream = spark.readStream.schema(frames_schema).parquet(frames_dir)

    def decode(batch, _bid):
        from_arrow_frames(batch, df.schema).write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(decode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.read.parquet(out_dir).count() == df.count()


def test_frames_stream_exactly_once_under_restart(spark, tmp_path):
    """Exactly-once frame decode across a stream restart (the Kafka
    offset-commit contract, exercised through the file source +
    checkpoint): run the stream to completion, land MORE frames, restart
    from the same checkpoint — already-processed frames must not be
    re-decoded, new ones must all arrive, and the decoded rows must
    equal the source rows value-for-value (not just by count)."""
    from promi_spark.io.binary import from_arrow_frames, to_arrow_frames

    ev = load_table(spark, "events", SF).select("event_id", "event_type", "value")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)

    frames_dir = str(tmp_path / "frames")
    out_dir = str(tmp_path / "decoded")
    ckpt = str(tmp_path / "ckpt")
    to_arrow_frames(first).write.mode("append").parquet(frames_dir)

    frames_schema = spark.read.parquet(frames_dir).schema

    def run_stream():
        stream = spark.readStream.schema(frames_schema).parquet(frames_dir)

        def decode(batch, _bid):
            from_arrow_frames(batch, first.schema).write.mode(
                "append"
            ).parquet(out_dir)

        q = (
            stream.writeStream.foreachBatch(decode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_stream()
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == first.count()

    # land a second wave of frames, restart from the same checkpoint
    to_arrow_frames(second).write.mode("append").parquet(frames_dir)
    run_stream()

    decoded = spark.read.parquet(out_dir)
    # exactly-once: first-wave frames were NOT re-decoded on restart
    assert decoded.count() == ev.count()
    assert decoded.select("event_id").distinct().count() == ev.count()
    # value-level parity with the source
    assert decoded.exceptAll(ev).count() == 0
    assert ev.exceptAll(decoded).count() == 0


def test_avro_roundtrip(spark):
    """Full Avro wire roundtrip (encode -> decode -> value parity).
    Executes in this container through the pure-Python fallback codec;
    on a cluster with spark-avro on the classpath (--packages
    org.apache.spark:spark-avro) the same call runs JVM-side — the two
    read each other's bytes (reference-jar parity test above)."""
    from promi_spark.io.binary import (
        avro_schema_json,
        from_avro_frames,
        to_avro_frames,
    )

    df = load_table(spark, "region", SF)
    # schema generation is pure python — always verified
    import json

    sch = json.loads(avro_schema_json(df.schema))
    assert sch["type"] == "record"
    assert [f["name"] for f in sch["fields"]] == df.columns

    wire = to_avro_frames(df)
    back = from_avro_frames(wire, df.schema)
    assert back.schema == df.schema
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )


def test_avro_roundtrip_timestamps_and_events(spark):
    """The wire path on the real event shape: timestamps cross the
    Avro boundary as timestamp-micros and come back value-identical."""
    from promi_spark.io.binary import from_avro_frames, to_avro_frames

    df = load_table(spark, "events", SF).select(
        "event_id", "event_type", "ts", "value"
    )
    back = from_avro_frames(to_avro_frames(df), df.schema)
    assert back.count() == df.count()
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_avro_schema_rejects_nested_columns(spark):
    import pytest as _pytest

    from promi_spark.io.binary import avro_schema_json

    df = spark.createDataFrame([(1, [1, 2])], "id long, xs array<int>")
    with _pytest.raises(NotImplementedError, match="xs"):
        avro_schema_json(df.schema)
