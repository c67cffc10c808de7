"""Property-based fuzz of the hand-rolled prompb wire codec (S2-S4):
arbitrary messages round-trip bit-exactly through encode -> snappy ->
decode, and hostile bytes never crash outside the documented error path."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from remote_tsdb_clickhouse_spark import codec, prompb
from remote_tsdb_clickhouse_spark.plans.matchers import LabelMatcher, MatcherType
from remote_tsdb_clickhouse_spark.plans.read_plan import ReadHints, ReadQuery

_text = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=["Cs"]), max_size=40
)
_ms = st.integers(min_value=0, max_value=2**53)
_val = st.one_of(
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.sampled_from([0.0, -0.0, 1e308, -1e308, 5e-324, float("inf"), float("-inf")]),
)

_label = st.builds(prompb.Label, name=_text, value=_text)
_sample = st.builds(prompb.Sample, value=_val, timestamp=_ms)
_series = st.builds(
    prompb.TimeSeries,
    labels=st.lists(_label, max_size=5),
    samples=st.lists(_sample, max_size=5),
)
_write_req = st.builds(prompb.WriteRequest, timeseries=st.lists(_series, max_size=4))

_matcher = st.builds(
    LabelMatcher,
    type=st.sampled_from(list(MatcherType)),
    name=_text,
    value=_text,
)
_query = st.builds(
    ReadQuery,
    start_ms=_ms,
    end_ms=_ms,
    matchers=st.lists(_matcher, max_size=4).map(tuple),
    hints=st.builds(ReadHints, step_ms=_ms, range_ms=_ms),
)
_read_req = st.builds(prompb.ReadRequest, queries=st.lists(_query, max_size=3))
_read_resp = st.builds(
    prompb.ReadResponse,
    results=st.lists(st.builds(prompb.QueryResult, timeseries=st.lists(_series, max_size=3)), max_size=3),
)


@settings(max_examples=200, deadline=None)
@given(req=_write_req)
def test_write_request_fuzz_roundtrip(req):
    assert codec.decode_write_request(codec.encode_write_request(req)) == req


@settings(max_examples=200, deadline=None)
@given(req=_read_req)
def test_read_request_fuzz_roundtrip(req):
    assert codec.decode_read_request(codec.encode_read_request(req)) == req


@settings(max_examples=200, deadline=None)
@given(resp=_read_resp)
def test_read_response_fuzz_roundtrip(resp):
    wire = codec.encode_read_response(resp)
    assert prompb.decode_read_response(codec.snappy_decompress(wire)) == resp


@settings(max_examples=300, deadline=None)
@given(junk=st.binary(max_size=200))
def test_hostile_bytes_never_crash_uncontrolled(junk):
    """Arbitrary bytes must raise a clean error (or, rarely, decode — snappy
    framing makes accidental validity almost impossible), never hang or
    corrupt state."""
    for fn in (codec.decode_write_request, codec.decode_read_request):
        try:
            fn(junk)
        except Exception as e:  # any *raised* error is fine; crashes are not
            assert isinstance(e, Exception)
