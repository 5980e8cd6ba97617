"""Property-based tests (hypothesis) for the transform core and hash
parity invariants — cheap distribution-wide guarantees on the operators
whose unit tests only probe single examples."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from clickhouse_hdfs_loader_spark.functions.murmur import (
    guava_shard_code,
    guava_shard_index,
    murmur3_128,
)
from clickhouse_hdfs_loader_spark.operators.sharding import (
    ClusterTopology,
    ShardNode,
)
from clickhouse_hdfs_loader_spark.operators.transform import (
    extract_hive_partitions,
)

# plain text without the delimiter or backslash — field-safe alphabet
field_text = st.text(
    alphabet=st.characters(blacklist_characters="|\\\n\r", codec="utf-8"),
    max_size=30)


@given(st.text(max_size=64))
@settings(max_examples=200, deadline=None)
def test_murmur_digest_shape_and_determinism(s):
    d1 = murmur3_128(s.encode("utf-16-le"))
    d2 = murmur3_128(s.encode("utf-16-le"))
    assert d1 == d2 and len(d1) == 16
    assert 0 <= guava_shard_code(s) <= 0x7FFFFFFF


@given(st.text(max_size=32), st.integers(min_value=1, max_value=64))
@settings(max_examples=200, deadline=None)
def test_shard_index_in_range(s, total_weight):
    assert 0 <= guava_shard_index(s, total_weight) < total_weight


@given(st.lists(st.integers(min_value=1, max_value=9), min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_weight_walk_covers_all_slots(weights):
    t = ClusterTopology([ShardNode(i + 1, w) for i, w in enumerate(weights)])
    table = t.slot_to_shard_index()
    assert len(table) == t.total_weight
    # cumulative walk agrees with the dense table for every slot
    for slot in range(t.total_weight):
        assert t.nodes[table[slot]] is t.shard_for_slot(slot)
    # each shard owns exactly `weight` slots
    for i, w in enumerate(weights):
        assert table.count(i) == w


@given(st.lists(field_text, min_size=1, max_size=10))
@settings(max_examples=100, deadline=None)
def test_tokenize_serialize_roundtrip_logic(fields):
    """Python-level model of T1: splitting a joined line on the delimiter
    with keep-trailing-empty semantics recovers the fields exactly."""
    line = "|".join(fields)
    assert line.split("|") == fields


# the reference's pattern is ASCII-only: [0-9a-zA-Z_]+=[0-9a-zA-Z_\-]+
# (AbstractClickhouseLoaderMapper.java:40) — non-ASCII keys are skipped
_key_alpha = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"


@given(st.dictionaries(
    st.text(alphabet=_key_alpha, min_size=1, max_size=8),
    st.text(alphabet=_key_alpha + "-", min_size=1, max_size=8),
    max_size=4))
@settings(max_examples=100, deadline=None)
def test_hive_partition_extraction_total(parts):
    path = "/data/" + "/".join(f"{k}={v}" for k, v in parts.items()) + "/f"
    assert extract_hive_partitions(path) == list(parts.items())


# --- parse_media_header runs on untrusted bytes inside executors: it must
# be TOTAL — never raise, never over-read — for any byte string, including
# truncations of real containers and adversarial marker/length garbage.

def _any_container(did: int) -> bytes:
    from clickhouse_hdfs_loader_spark.operators import multimodal as MM
    w, h = 1 + did % 512, 1 + (did * 7) % 512
    builders = [lambda: MM.build_png(w, h), lambda: MM.build_gif(w, h),
                lambda: MM.build_bmp(w, h),
                lambda: MM.build_wav(16000, 16, 1 + did % 2),
                lambda: MM.build_mp4(w, h),
                lambda: MM.build_webp(w, h, "vp8"),
                lambda: MM.build_webp(w, h, "vp8l"),
                lambda: MM.build_webp(w, h, "vp8x"),
                lambda: MM.build_flac(8000 + (did % 8) * 4000, 16,
                                      1 + did % 2),
                lambda: MM.build_heif(w, h, b"heic"),
                lambda: MM.build_heif(w, h, b"avif"),
                lambda: MM.build_tiff(w, h, 3, big_endian=bool(did % 2))]
    return builders[did % len(builders)]()


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=300, deadline=None)
def test_parse_media_header_total_on_garbage(data):
    from clickhouse_hdfs_loader_spark.operators.multimodal import \
        parse_media_header
    out = parse_media_header(data)
    assert out is None or (len(out) == 5 and out[0] == len(data))


@given(st.integers(min_value=0, max_value=5000), st.integers(0, 300))
@settings(max_examples=200, deadline=None)
def test_parse_media_header_total_on_truncations(did, cut):
    from clickhouse_hdfs_loader_spark.operators.multimodal import \
        parse_media_header
    full = _any_container(did)
    out = parse_media_header(full[:cut])
    if cut >= len(full):
        assert out is not None            # whole container always parses
    elif out is not None:
        assert out[0] == min(cut, len(full))


@given(st.binary(min_size=0, max_size=120))
@settings(max_examples=200, deadline=None)
def test_parse_media_header_jpeg_walker_bounded(tail):
    """Adversarial JPEG bodies (random markers / segment lengths / fill
    bytes) after a valid SOI must terminate and never raise — the walker
    is driven by untrusted length fields."""
    from clickhouse_hdfs_loader_spark.operators.multimodal import \
        parse_media_header
    out = parse_media_header(b"\xff\xd8" + tail)
    assert out is None or out[4] == "jpeg"


@given(st.lists(st.integers(min_value=0, max_value=10**9),
                min_size=1, max_size=400, unique=True),
       st.integers(min_value=1, max_value=30),
       st.floats(min_value=1.5, max_value=8.0))
@settings(max_examples=200, deadline=None)
def test_quota_prefilter_threshold_model(ids, quota, margin):
    """Pure-Python model of quota_sample's two-phase identity invariant:
    the md5 rank order is monotone in its 32-bit hex prefix, so the
    prefix-threshold survivor set is a PREFIX of the exact ranking —
    whenever >= min(quota, n) rows survive, the kept set is EXACTLY the
    exact plan's kept set. Pins the threshold formula (hex parse base,
    2^32 scale, float compare direction) against drift without paying a
    Spark job per example."""
    import hashlib
    n = len(ids)
    ranked = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode())
                                        .hexdigest(), i))
    exact_keep = ranked[:quota]
    if n <= quota * margin:
        thr = float(1 << 32)
    else:
        thr = quota * margin / n * float(1 << 32)
    survivors = [i for i in ids
                 if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) < thr]
    sur_ranked = sorted(survivors, key=lambda i: (hashlib.md5(str(i).encode())
                                                  .hexdigest(), i))
    # prefix-closure: survivors are always a prefix of the exact ranking
    assert sur_ranked == ranked[:len(sur_ranked)]
    if len(survivors) >= min(quota, n):
        assert sur_ranked[:quota] == exact_keep
