"""Property fuzz for the aHash (phash64) Spark kernel: the JVM
higher-order-function pipeline (hex once → 64-point resample → mean
threshold → band packing) must agree bit-for-bit with an independent
pure-Python reference on arbitrary unicode payloads — this pins the
2-hex-chars-per-byte indexing, the integer `div` resample positions,
the strict `>` mean threshold, and the little-endian bit order within
each 16-bit band word.

Hypothesis drives ONE Spark action over the whole drawn corpus (batched
examples, not one action per example) to keep the fuzz cheap."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _ref_phash(text: str) -> list:
    """Independent reference: same contract as multimodal.phash64."""
    buf = text.encode("utf-8")
    n = len(buf)
    samples = [buf[(i * n) // 64] for i in range(64)]
    tot = sum(samples)
    bits = [1 if s * 64 > tot else 0 for s in samples]
    return [sum(bits[b * 16 + j] << j for j in range(16)) for b in range(4)]


_payload = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
    min_size=1, max_size=200)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_payload, min_size=1, max_size=24))
def test_phash64_matches_python_reference(spark, texts):
    from binlog_spark.operators.multimodal import phash64

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r["doc_id"]: list(r["bands"]) for r in phash64(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _ref_phash(t), repr(t)
