"""Avro binary codec + object-container tests (SURVEY.md §5 model: pin the
storage layer with round-trip and split-coverage properties). Round 7 adds
CROSS-IMPLEMENTATION validation against the reference Java Avro library
(avro-1.12.1, already on Spark's JVM classpath, driven via py4j) — the
codec is no longer only self-consistent: Java must parse Python-written
containers and Python must parse Java-written ones, and the split protocol
must agree with Java's own sync()/pastSync()."""

from __future__ import annotations

import datetime
import io
import os
from decimal import Decimal

import pytest

from avro_parquet_spark_example_spark.sources import avro_binary as ab

FULL_SCHEMA = {
    "type": "record",
    "name": "Everything",
    "namespace": "example.avro",
    "fields": [
        {"name": "f_long", "type": "long"},
        {"name": "f_int", "type": "int"},
        {"name": "f_bool", "type": "boolean"},
        {"name": "f_float", "type": "float"},
        {"name": "f_double", "type": "double"},
        {"name": "f_str", "type": "string"},
        {"name": "f_bytes", "type": "bytes"},
        {"name": "f_opt", "type": ["null", "string"]},
        {"name": "f_arr", "type": {"type": "array", "items": "long"}},
        {"name": "f_map", "type": {"type": "map", "values": "double"}},
        {"name": "f_enum", "type": {"type": "enum", "name": "Color",
                                    "symbols": ["RED", "GREEN", "BLUE"]}},
        {"name": "f_fixed", "type": {"type": "fixed", "name": "F8", "size": 8}},
        {"name": "f_date", "type": {"type": "int", "logicalType": "date"}},
        {"name": "f_ts_ms", "type": {"type": "long",
                                     "logicalType": "timestamp-millis"}},
        {"name": "f_ts_us", "type": {"type": "long",
                                     "logicalType": "timestamp-micros"}},
        {"name": "f_dec", "type": {"type": "bytes", "logicalType": "decimal",
                                   "precision": 10, "scale": 2}},
        {"name": "f_nested", "type": {
            "type": "record", "name": "Inner",
            "fields": [{"name": "a", "type": "long"},
                       {"name": "b", "type": ["null", "double"]}]}},
    ],
}


def _mk_row(i: int) -> tuple:
    return (
        i,
        -i,
        i % 2 == 0,
        float(i) / 4,  # exactly representable in float32
        i * 1.5,
        f"row-{i}" * (i % 3 + 1),
        bytes([i % 256, (i * 7) % 256]),
        None if i % 3 == 0 else f"opt-{i}",
        list(range(i % 5)),
        {f"k{j}": j * 0.5 for j in range(i % 3)},
        ["RED", "GREEN", "BLUE"][i % 3],
        bytes([i % 256]) * 8,
        datetime.date(1970, 1, 1) + datetime.timedelta(days=i * 37),
        datetime.datetime(2020, 1, 1) + datetime.timedelta(milliseconds=i * 999),
        datetime.datetime(2020, 1, 1) + datetime.timedelta(microseconds=i * 31),
        Decimal(i * 100 - 5000).scaleb(-2),
        (i * 2, None if i % 2 else float(i)),
    )


ROWS = [_mk_row(i) for i in range(257)]


def test_value_roundtrip_all_types():
    enc = ab.compile_encoder(FULL_SCHEMA)
    dec = ab.compile_decoder(FULL_SCHEMA)
    buf = io.BytesIO()
    for r in ROWS:
        enc(buf, r)
    buf.seek(0)
    out = [dec(buf) for _ in ROWS]
    assert out == ROWS
    assert not buf.read(1)


def test_varint_zigzag_edge_values():
    for v in (0, -1, 1, 63, 64, -64, -65, 2**31 - 1, -(2**31), 2**62, -(2**62)):
        buf = io.BytesIO()
        ab.write_long(buf, v)
        buf.seek(0)
        assert ab.read_long(buf) == v


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(tmp_path, codec):
    path = str(tmp_path / f"all_{codec}.avro")
    n = ab.write_container(path, FULL_SCHEMA, ROWS, codec=codec, block_records=10)
    assert n == len(ROWS)
    schema_json, it = ab.read_container(path)
    assert '"Everything"' in schema_json
    assert list(it) == ROWS


def test_container_empty(tmp_path):
    path = str(tmp_path / "empty.avro")
    assert ab.write_container(path, FULL_SCHEMA, []) == 0
    _, it = ab.read_container(path)
    assert list(it) == []


def test_bad_magic(tmp_path):
    path = str(tmp_path / "bad.avro")
    with open(path, "wb") as fo:
        fo.write(b"PAR1" + b"\x00" * 32)
    with pytest.raises(ab.AvroBinaryError):
        ab.read_container(path)


def test_sync_mismatch_detected(tmp_path):
    path = str(tmp_path / "corrupt.avro")
    ab.write_container(path, FULL_SCHEMA, ROWS[:50], block_records=10)
    data = bytearray(open(path, "rb").read())
    data[-1] ^= 0xFF  # flip a byte in the final sync marker
    open(path, "wb").write(bytes(data))
    _, it = ab.read_container(path)
    with pytest.raises(ab.AvroBinaryError):
        list(it)


@pytest.mark.parametrize("split_bytes", [64, 257, 1000, 4096, 10**9])
@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_split_coverage_exact_once(tmp_path, split_bytes, codec):
    """THE splittability property: for ANY split granularity, the union of
    all splits' records equals the sequential read, each record exactly
    once. This is what lets one container file fan out to N tasks."""
    path = str(tmp_path / f"split_{codec}_{split_bytes}.avro")
    ab.write_container(path, FULL_SCHEMA, ROWS, codec=codec, block_records=7)
    with open(path, "rb") as fo:
        schema_json, got_codec, sync, body_offset = ab.read_header(fo)
    size = os.path.getsize(path)
    lo = body_offset - ab.SYNC_SIZE
    out = []
    while lo < size:
        hi = min(lo + split_bytes, size)
        out.extend(
            ab.read_container_split(path, lo, hi, schema_json, got_codec, sync.hex())
        )
        lo = hi
    assert out == ROWS  # block order is file order, so exact equality holds


def test_datasource_exact_once_at_many_splits(spark, sf_dir, tmp_path):
    """Exactly-once through the REGISTERED avrofile source (not just the
    codec-level split reader): one container file, forced >=8 byte-splits,
    the scan's row multiset must equal the source table exactly — no
    dropped boundary block, no double-owned block."""
    from avro_parquet_spark_example_spark.sources.avro_datasource import (
        SUPPLIER_AVRO_SCHEMA,
        AvroContainerReader,
        ensure_registered,
        write_distributed,
    )
    from avro_parquet_spark_example_spark.sources.catalog import load

    src = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    out = str(tmp_path / "supplier_many_splits.avro.d")
    # one shard so all splits hit one file; tiny blocks so splits land
    # mid-file rather than all past EOF
    write_distributed(
        src.coalesce(1), out, SUPPLIER_AVRO_SCHEMA, block_records=4
    )
    [shard] = [f for f in os.listdir(out) if f.endswith(".avro")]
    size = os.path.getsize(os.path.join(out, shard))
    # the first split starts after the header, so budget ~20 splits of the
    # full file size to guarantee >=8 land inside the body
    split_bytes = max(size // 20, 1)

    n_splits = len(
        AvroContainerReader(
            {"path": out, "split_bytes": str(split_bytes)}
        ).partitions()
    )
    assert n_splits >= 8, f"only {n_splits} splits planned for {size} bytes"

    ensure_registered(spark)
    back = (
        spark.read.format("avrofile")
        .option("path", out)
        .option("split_bytes", split_bytes)
        .load()
    )
    expect = sorted(map(tuple, src.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == expect


def test_datasource_rejects_heterogeneous_schemas(tmp_path):
    """A directory mixing .avro files with different schemas must fail at
    plan time (splits decode with per-file schemas while the source
    announces the first file's — silent nonconforming rows otherwise)."""
    from avro_parquet_spark_example_spark.sources.avro_datasource import (
        AvroContainerReader,
    )

    s1 = {"type": "record", "name": "A",
          "fields": [{"name": "x", "type": "long"}]}
    s2 = {"type": "record", "name": "B",
          "fields": [{"name": "y", "type": "string"}]}
    ab.write_container(str(tmp_path / "a.avro"), s1, [(1,), (2,)])
    ab.write_container(str(tmp_path / "b.avro"), s2, [("u",)])
    with pytest.raises(ValueError, match="heterogeneous"):
        AvroContainerReader({"path": str(tmp_path)}).partitions()


@pytest.mark.parametrize("py_codec,j_codec", [("null", "deflate"), ("deflate", "null")])
def test_java_avro_cross_validation(spark, tmp_path, py_codec, j_codec):
    """The reference implementation gate: the Java Avro library
    (org.apache.avro 1.12.1, on Spark's classpath) must (a) open and
    fully decode a Python-written container — magic, header meta map,
    schema JSON, blocks, codec, sync markers, every record of the
    all-types schema — and (b) produce a container (GenericDatumWriter +
    DataFileWriter, its own random sync, its own codec) that the Python
    codec decodes back to the ORIGINAL values. Logical types (decimal,
    date, timestamps) pass through Java as their raw encodings, so value
    equality after the Java round-trip proves the Python logical
    encodings are the spec's. Both codec directions are exercised."""
    jvm = spark._jvm
    p_py = str(tmp_path / "py_written.avro")
    p_j = str(tmp_path / "java_written.avro")
    ab.write_container(p_py, FULL_SCHEMA, ROWS, codec=py_codec, block_records=13)

    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p_py), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    jschema = reader.getSchema()
    assert jschema.getFullName() == "example.avro.Everything"
    assert reader.getMetaString("avro.codec") == py_codec
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(jschema)
    )
    if j_codec == "deflate":
        writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.create(jschema, jvm.java.io.File(p_j))
    n = 0
    while reader.hasNext():
        writer.append(reader.next())
        n += 1
    writer.close()
    reader.close()
    assert n == len(ROWS), "Java reader must see every Python-written record"

    schema_json, it = ab.read_container(p_j)
    assert list(it) == ROWS, "values must survive the Java decode/encode cycle"


def test_java_avro_split_protocol_agrees(spark, tmp_path):
    """Splittability against the REFERENCE split protocol: for arbitrary
    byte ranges [lo, hi), Java's DataFileReader.sync(lo) + pastSync(hi)
    (exactly Hadoop AvroInputFormat's ownership rule) must yield the same
    per-split record partition as ab.read_container_split — same counts,
    same first field values, exact-once union."""
    schema = {
        "type": "record",
        "name": "S",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "v", "type": "string"},
        ],
    }
    rows = [(i, f"value-{i:04d}" * (i % 4 + 1)) for i in range(211)]
    path = str(tmp_path / "split_xcheck.avro")
    ab.write_container(path, schema, rows, codec="null", block_records=9)
    with open(path, "rb") as fo:
        schema_json, codec, sync, body_offset = ab.read_header(fo)
    size = os.path.getsize(path)

    jvm = spark._jvm
    for split_bytes in (97, 512, 2048):
        lo = body_offset - ab.SYNC_SIZE
        union: list = []
        while lo < size:
            hi = min(lo + split_bytes, size)
            ours = list(
                ab.read_container_split(path, lo, hi, schema_json, codec, sync.hex())
            )
            reader = jvm.org.apache.avro.file.DataFileReader(
                jvm.java.io.File(path),
                jvm.org.apache.avro.generic.GenericDatumReader(),
            )
            reader.sync(lo)
            theirs = []
            while reader.hasNext() and not reader.pastSync(hi):
                theirs.append(reader.next().get(0))
            reader.close()
            assert [r[0] for r in ours] == theirs, (
                f"split [{lo},{hi}) disagrees with Java: "
                f"ours={len(ours)} theirs={len(theirs)}"
            )
            union.extend(ours)
            lo = hi
        assert union == rows


def test_write_distributed_leaves_no_tmp_files(spark, sf_dir, tmp_path):
    """The rename-commit protocol must clean up: only part-*.avro shards in
    the output directory, every one a readable container."""
    from avro_parquet_spark_example_spark.sources.avro_datasource import (
        SUPPLIER_AVRO_SCHEMA,
        write_distributed,
    )
    from avro_parquet_spark_example_spark.sources.catalog import load

    src = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    out = str(tmp_path / "commit_check.avro.d")
    write_distributed(src.repartition(4), out, SUPPLIER_AVRO_SCHEMA)
    names = sorted(os.listdir(out))
    assert names and all(
        n.startswith("part-") and n.endswith(".avro") for n in names
    ), names
    total = sum(
        len(list(ab.read_container(os.path.join(out, n))[1])) for n in names
    )
    assert total == src.count()
