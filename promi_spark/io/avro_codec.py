"""Pure-Python Avro *binary datum* codec for flat records — the wire
fallback behind :func:`promi_spark.io.binary.to_avro_frames` /
``from_avro_frames`` when the spark-avro DataSource is not on the
classpath (this container ships Spark without it).

Implements the public Avro 1.12 binary encoding (spec §"Binary
Encoding"): zigzag-varint ints/longs, length-prefixed strings/bytes,
IEEE little-endian floats/doubles, ``["null", T]`` unions as a
zigzag-varint branch index followed by the value, records as the
concatenation of their fields in schema order. Logical types follow
Spark's own to_avro mapping: timestamp → long ``timestamp-micros``,
date → int days, decimal → minimal two's-complement big-endian bytes.

Byte-level parity with the Apache Avro REFERENCE implementation is
pinned by tests: the ``avro-1.12.1`` jar on Spark's classpath decodes
Python-encoded datums and vice versa via py4j
(``tests/test_binary.py``), so frames produced here are readable by
any Avro consumer — including spark-avro's ``from_avro`` on a real
cluster. Per-row Python is the accepted cost of the FALLBACK path;
with spark-avro present the JVM codec is used instead (see binary.py).

Reference: extends the reference engine's declared-only binary wire
(``/root/reference/src/lib.rs:29-32``); no Avro exists there at all.
"""

from __future__ import annotations

import struct
from collections.abc import Callable
from datetime import date, datetime, timedelta, timezone
from decimal import Decimal

from pyspark.sql.types import StructType

_EPOCH = datetime(1970, 1, 1)
_EPOCH_UTC = datetime(1970, 1, 1, tzinfo=timezone.utc)
_EPOCH_DATE = date(1970, 1, 1)


# --- primitive writers (spec: zigzag varint for int/long) -------------------


def _enc_long(out: bytearray, v: int) -> None:
    n = (v << 1) ^ (v >> 63)  # zigzag; exact for -2^63 <= v < 2^63
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _dec_long(buf: bytes, pos: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (n >> 1) ^ -(n & 1), pos  # un-zigzag


def _ts_micros(v: datetime) -> int:
    # exact integer micros (float .timestamp() would round)
    td = v - (_EPOCH_UTC if v.tzinfo else _EPOCH)
    return (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds


def _unscaled_bytes(v: Decimal, scale: int) -> bytes:
    q = v.scaleb(scale)
    u = int(q)
    if q != u:
        raise ValueError(f"decimal {v} does not fit scale {scale}")
    # minimal two's-complement big-endian — Java BigInteger.toByteArray
    # parity (bitLength excludes the sign bit)
    bl = (abs(u) - 1).bit_length() if u < 0 else u.bit_length()
    return u.to_bytes(bl // 8 + 1, "big", signed=True)


# --- per-type (encode, decode) pairs ----------------------------------------
# encode: (out, value) -> None ; decode: (buf, pos) -> (value, pos)


def _codec_for(field) -> tuple[Callable, Callable]:
    t = field.dataType.typeName()
    if t in ("long", "integer", "short", "byte"):
        return _enc_long, _dec_long
    if t == "string":

        def enc_s(out, v):
            b = v.encode("utf-8")
            _enc_long(out, len(b))
            out.extend(b)

        def dec_s(buf, pos):
            n, pos = _dec_long(buf, pos)
            return buf[pos : pos + n].decode("utf-8"), pos + n

        return enc_s, dec_s
    if t == "binary":

        def enc_b(out, v):
            _enc_long(out, len(v))
            out.extend(v)

        def dec_b(buf, pos):
            n, pos = _dec_long(buf, pos)
            return bytes(buf[pos : pos + n]), pos + n

        return enc_b, dec_b
    if t == "double":

        def enc_d(out, v):
            out.extend(struct.pack("<d", v))

        def dec_d(buf, pos):
            return struct.unpack_from("<d", buf, pos)[0], pos + 8

        return enc_d, dec_d
    if t == "float":

        def enc_f(out, v):
            out.extend(struct.pack("<f", v))

        def dec_f(buf, pos):
            return struct.unpack_from("<f", buf, pos)[0], pos + 4

        return enc_f, dec_f
    if t == "boolean":

        def enc_bool(out, v):
            out.append(1 if v else 0)

        def dec_bool(buf, pos):
            return buf[pos] != 0, pos + 1

        return enc_bool, dec_bool
    if t in ("timestamp", "timestamp_ntz"):

        def enc_ts(out, v):
            _enc_long(out, _ts_micros(v))

        def dec_ts(buf, pos):
            us, pos = _dec_long(buf, pos)
            return _EPOCH + timedelta(microseconds=us), pos

        return enc_ts, dec_ts
    if t == "date":

        def enc_dt(out, v):
            _enc_long(out, (v - _EPOCH_DATE).days)

        def dec_dt(buf, pos):
            d, pos = _dec_long(buf, pos)
            return _EPOCH_DATE + timedelta(days=d), pos

        return enc_dt, dec_dt
    if t == "decimal":
        scale = field.dataType.scale

        def enc_dec(out, v):
            b = _unscaled_bytes(v, scale)
            _enc_long(out, len(b))
            out.extend(b)

        def dec_dec(buf, pos):
            n, pos = _dec_long(buf, pos)
            u = int.from_bytes(buf[pos : pos + n], "big", signed=True)
            return Decimal(u).scaleb(-scale), pos + n

        return enc_dec, dec_dec
    raise NotImplementedError(
        f"avro wire codec: unsupported column type {t!r} ({field.name}); "
        "flatten or cast before framing"
    )


def row_encoder(schema: StructType) -> Callable[[tuple], bytes]:
    """Encoder for one row tuple (schema field order) → Avro binary
    datum bytes, matching spark-avro's ``to_avro(struct(...))`` output
    for the same ``["null", T]``-union record schema
    (:func:`binary.avro_schema_json`)."""
    codecs = [(f.nullable, _codec_for(f)[0]) for f in schema.fields]

    def encode(row) -> bytes:
        out = bytearray()
        for (nullable, enc), v in zip(codecs, row):
            if nullable:
                if v is None:
                    _enc_long(out, 0)  # union branch: null
                    continue
                _enc_long(out, 1)  # union branch: value
            elif v is None:
                raise ValueError("null in non-nullable avro field")
            enc(out, v)
        return bytes(out)

    return encode


def row_decoder(schema: StructType) -> Callable[[bytes], tuple]:
    """Decoder for one Avro binary datum → row tuple in schema order."""
    codecs = [(f.nullable, _codec_for(f)[1], f.name) for f in schema.fields]

    def decode(buf: bytes) -> tuple:
        pos = 0
        vals = []
        for nullable, dec, name in codecs:
            if nullable:
                branch, pos = _dec_long(buf, pos)
                if branch == 0:
                    vals.append(None)
                    continue
                if branch != 1:
                    raise ValueError(
                        f"avro decode: union branch {branch} in {name}"
                    )
            v, pos = dec(buf, pos)
            vals.append(v)
        if pos != len(buf):
            raise ValueError(
                f"avro decode: {len(buf) - pos} trailing bytes"
            )
        return tuple(vals)

    return decode
