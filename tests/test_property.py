"""Property-based tests (hypothesis) for the pure-Python kernels —
mirrors the reference's table-driven unit matrices (SURVEY §5) with
generated cases instead of fixed ones. No Spark session needed: fast.
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from philotes_spark.multimodal.binary_ops import decode_audio_wav, encode_wav
from philotes_spark.streaming.backpressure import (
    BackpressureConfig,
    BackpressureController,
)
from philotes_spark.streaming.reliability import RetryPolicy


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=4000),
    sr=st.sampled_from([8000, 16000, 44100]),
    amp=st.floats(min_value=0.01, max_value=0.99),
    sw=st.sampled_from([1, 2, 4]),
)
def test_wav_roundtrip_preserves_shape_and_energy(n, sr, amp, sw):
    x = [amp * math.sin(2 * math.pi * 5 * i / n) for i in range(n)]
    got = decode_audio_wav(encode_wav(x, sample_rate=sr, sampwidth=sw))
    assert got["n_samples"] == n
    assert got["sample_rate"] == sr
    assert got["duration_s"] == n / sr
    # quantization error bound: half an LSB of the sample width
    lsb = 1.0 / (2 ** (8 * sw - 1) - 1)
    assert got["peak"] <= amp + lsb
    expected_rms = math.sqrt(sum(v * v for v in x) / n)
    assert abs(got["rms"] - expected_rms) <= lsb + 1e-9


@settings(max_examples=60, deadline=None)
@given(depths=st.lists(st.integers(min_value=0, max_value=20000), max_size=60))
def test_backpressure_invariants(depths):
    events = []
    c = BackpressureController(
        BackpressureConfig(),
        get_size=iter(depths).__next__,
        pause=lambda: events.append("pause"),
        resume=lambda: events.append("resume"),
    )
    paused = False
    for d in depths:
        action = c.check()
        # hysteresis truth table
        if not paused and d > 8000:
            assert action == "paused"
            paused = True
        elif paused and d < 5000:
            assert action == "resumed"
            paused = False
        else:
            assert action == "noop"
    # events strictly alternate, starting with pause
    assert all(e == ("pause" if i % 2 == 0 else "resume") for i, e in enumerate(events))
    assert c.stats.pause_count - c.stats.resume_count in (0, 1)


@settings(max_examples=40, deadline=None)
@given(
    attempt=st.integers(min_value=0, max_value=10),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_retry_backoff_bounded(attempt, seed):
    import random

    p = RetryPolicy()
    b = p.backoff(attempt, random.Random(seed))
    # never exceeds max_backoff + jitter band; never negative
    assert 0 <= b <= p.max_backoff * (1 + p.jitter)
    if attempt == 0:
        assert b >= p.initial_backoff * (1 - p.jitter)


# --- DML parser properties (r07 general MERGE grammar) -----------------------


class TestMergeParserProperties:
    """The statement parser must be total over the grammar: any
    statement assembled from valid components parses back to exactly
    its components — aliases, clause kinds, conditions, SET lists —
    regardless of whitespace, case, or nesting in expressions."""

    from hypothesis import given, settings, strategies as st

    idents = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)
    # expressions with commas/parens/quotes that must NOT confuse the
    # depth-aware splitters
    exprs = st.sampled_from([
        "s.v + 1",
        "coalesce(s.v, t.v, 0)",
        "CASE WHEN s.v > 0 THEN 'a,b' ELSE '(c)' END",
        "concat(s.name, ', ', t.name)",
        "round(s.v * (t.v + 2), 2)",
    ])
    conds = st.sampled_from([
        None,
        "s.v < 0",
        "t.v > s.v AND s.flag",
        "s.name IN ('x,y', 'z')",
    ])

    @given(
        t=idents, ta=idents, sa=idents,
        set_exprs=st.lists(exprs, min_size=1, max_size=3),
        mc=conds, ic=conds,
        use_subquery=st.booleans(),
        data=st.data(),
    )
    @settings(max_examples=60, deadline=None)
    def test_parse_round_trips(self, t, ta, sa, set_exprs, mc, ic,
                               use_subquery, data):
        from hypothesis import assume

        from philotes_spark.sql_frontend import _parse_merge

        assume(len({t, ta, sa}) == 3)
        assume(not {t, ta, sa} & {"using", "on", "when", "as", "merge"})
        cols = [f"c{i}" for i in range(len(set_exprs))]
        set_list = ", ".join(f"{c} = {e}" for c, e in zip(cols, set_exprs))
        src = "(SELECT * FROM raw WHERE x IN (1, 2))" if use_subquery else "srctbl"
        stmt = (
            f"MERGE INTO {t} AS {ta} USING {src} AS {sa} "
            f"ON {ta}.k = {sa}.k "
        )
        if mc:
            stmt += f"WHEN MATCHED AND {mc} THEN DELETE "
        stmt += f"WHEN MATCHED THEN UPDATE SET {set_list} "
        if ic:
            stmt += f"WHEN NOT MATCHED AND {ic} THEN INSERT * "
        else:
            stmt += "WHEN NOT MATCHED THEN INSERT * "
        stmt += "WHEN NOT MATCHED BY SOURCE THEN DELETE"

        spec = _parse_merge(stmt)
        assert spec.target == t and spec.t_alias == ta and spec.s_alias == sa
        assert spec.source_is_query is use_subquery
        assert spec.on.strip() == f"{ta}.k = {sa}.k"
        kinds = [a["op"] for _, a in spec.matched]
        assert kinds == (["delete", "update"] if mc else ["update"])
        upd = spec.matched[-1][1]
        assert list(upd["set"]) == cols
        assert [e.strip() for e in upd["set"].values()] == set_exprs
        assert [a["op"] for _, a in spec.not_matched] == ["insert_all"]
        assert spec.not_matched[0][0] == (f"{ic}" if ic else None)
        assert [a["op"] for _, a in spec.nmbs] == ["delete"]

    @given(items=st.lists(exprs, min_size=1, max_size=5))
    @settings(max_examples=40, deadline=None)
    def test_split_top_is_inverse_of_join(self, items):
        from philotes_spark.sql_frontend import _split_top

        joined = ", ".join(items)
        assert [p.strip() for p in _split_top(joined)] == items


# --- Avro codec properties (r07 manifest layer) ------------------------------


class TestAvroCodecProperties:
    """The stdlib Avro codec must round-trip arbitrary values of the
    Iceberg-manifest type repertoire exactly — zigzag longs at the
    64-bit edges, unicode strings, nested arrays/maps/unions."""

    from hypothesis import given, settings, strategies as st

    longs = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    strings = st.text(max_size=40)
    blobs = st.binary(max_size=40)

    @given(n=longs)
    @settings(max_examples=200, deadline=None)
    def test_zigzag_long_round_trip(self, n):
        import io

        from philotes_spark.sources.avro import read_long, write_long

        buf = io.BytesIO()
        write_long(buf, n)
        buf.seek(0)
        assert read_long(buf) == n

    @given(
        s=strings, b=blobs, l=longs, d=st.floats(allow_nan=False),
        flag=st.booleans(),
        opt=st.one_of(st.none(), longs),
        arr=st.lists(longs, max_size=8),
        m=st.dictionaries(st.text(max_size=8), strings, max_size=5),
    )
    @settings(max_examples=100, deadline=None)
    def test_record_round_trip(self, s, b, l, d, flag, opt, arr, m):
        import io

        from philotes_spark.sources.avro import decode, encode

        schema = {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "s", "type": "string"},
                {"name": "b", "type": "bytes"},
                {"name": "l", "type": "long"},
                {"name": "d", "type": "double"},
                {"name": "flag", "type": "boolean"},
                {"name": "opt", "type": ["null", "long"]},
                {"name": "arr", "type": {"type": "array", "items": "long"}},
                {"name": "m", "type": {"type": "map", "values": "string"}},
            ],
        }
        val = {"s": s, "b": b, "l": l, "d": d, "flag": flag,
               "opt": opt, "arr": arr, "m": m}
        buf = io.BytesIO()
        encode(buf, schema, val)
        buf.seek(0)
        assert decode(buf, schema) == val

    @given(v=st.one_of(longs, st.floats(allow_nan=False, allow_infinity=False),
                       strings))
    @settings(max_examples=100, deadline=None)
    def test_single_value_serialization_round_trips(self, v):
        from hypothesis import assume

        from philotes_spark.sources.iceberg_manifest import (
            decode_single_value,
            single_value_bytes,
        )

        if isinstance(v, str):
            typ = "string"
        elif isinstance(v, int):
            typ = "long"
        else:
            typ = "double"
        data = single_value_bytes(v, typ)
        assume(data is not None)
        assert decode_single_value(data, typ) == v

    @given(
        v=st.datetimes(
            min_value=__import__("datetime").datetime(1800, 1, 1),
            max_value=__import__("datetime").datetime(2300, 1, 1),
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_temporal_single_value_round_trips(self, v):
        """r16: timestamp bounds serialize as µs-from-epoch int64 and
        date bounds as days-from-epoch int32 (the Iceberg spec's
        single-value forms) — round-tripping BOTH the object and the
        manifest's stored TEXT spelling (naive, date-only, and the
        legacy '+00:00'-suffixed form) to the same instant. The binary
        order must equal chronological order (fixed-width little-endian
        signed ints compared as ints — the reader unpacks before
        comparing)."""
        import datetime as dt

        from philotes_spark.sources.iceberg_manifest import (
            decode_single_value,
            single_value_bytes,
        )

        for typ in ("timestamp", "timestamptz"):
            for spelling in (v, str(v), str(v.replace(tzinfo=dt.timezone.utc))):
                data = single_value_bytes(spelling, typ)
                assert decode_single_value(data, typ) == v
        d = v.date()
        for spelling in (d, str(d)):
            data = single_value_bytes(spelling, "date")
            assert decode_single_value(data, "date") == d


class TestProbeSafeOrdering:
    """r15 pruning fix invariants: `_probe_safe` casts datetime/date
    probes to the manifest's stored ISO text, and the whole fix is
    sound ONLY if that text's lexicographic order equals the values'
    chronological order for every spelling `str()` emits (including
    the microsecond-less prefix form)."""

    _dts = st.datetimes(
        min_value=__import__("datetime").datetime(1, 1, 1),
        max_value=__import__("datetime").datetime(9999, 12, 28),
    )

    @given(a=_dts, b=_dts)
    @settings(max_examples=300, deadline=None)
    def test_datetime_iso_text_orders_like_values(self, a, b):
        from philotes_spark.sources.snapshots import _json_safe, _probe_safe

        assert (a < b) == (_probe_safe(a) < _probe_safe(b))
        # and the probe form is exactly the stored-stat form
        assert _probe_safe(a) == _json_safe(a)

    @given(a=_dts, b=_dts)
    @settings(max_examples=200, deadline=None)
    def test_zero_microsecond_prefix_form_still_orders(self, a, b):
        from philotes_spark.sources.snapshots import _probe_safe

        a = a.replace(microsecond=0)  # str() elides '.000000'
        assert (a < b) == (_probe_safe(a) < _probe_safe(b))
        assert (b < a) == (_probe_safe(b) < _probe_safe(a))

    @given(a=st.dates(), b=st.dates())
    @settings(max_examples=200, deadline=None)
    def test_date_iso_text_orders_like_values(self, a, b):
        from philotes_spark.sources.snapshots import _probe_safe

        assert (a < b) == (_probe_safe(a) < _probe_safe(b))

    @given(a=st.dates(), b=_dts)
    @settings(max_examples=300, deadline=None)
    def test_mixed_date_datetime_orders_like_coerced_values(self, a, b):
        """r16 (VERDICT r15 wrong #1): a date probe and a datetime
        stat/probe must order in text exactly as Spark orders the
        coerced values (date → its midnight instant) — BOTH directions.
        The pre-fix bug: str(date) is a strict PREFIX of the midnight
        datetime's text, so the boundary 'equal instant' case sorted
        date-first and a hi-bound date probe pruned the file whose min
        is exactly midnight."""
        import datetime as dt

        from philotes_spark.sources.snapshots import _probe_safe

        a_mid = dt.datetime(a.year, a.month, a.day)
        assert (a_mid < b) == (_probe_safe(a) < _probe_safe(b))
        assert (b < a_mid) == (_probe_safe(b) < _probe_safe(a))
        assert (a_mid == b) == (_probe_safe(a) == _probe_safe(b))

    @given(a=st.dates(), b=_dts)
    @settings(max_examples=300, deadline=None)
    def test_stat_canon_aligns_stored_spellings(self, a, b):
        """Compare-time canonicalization (`_stat_canon`) of STORED stat
        text: a date-shaped stat against a datetime probe (and a
        tz-suffixed pre-r15 stat against a naive probe) must compare on
        the instant, not the text accident."""
        import datetime as dt

        from philotes_spark.sources.snapshots import _probe_safe, _stat_canon

        a_mid = dt.datetime(a.year, a.month, a.day)
        # stored date text (what _json_safe writes for a DATE column)
        assert _stat_canon(str(a)) == _probe_safe(a)
        assert (a_mid < b) == (_stat_canon(str(a)) < _probe_safe(b))
        # stored tz-suffixed text (pre-r15 manifests)
        b_utc = b.replace(tzinfo=dt.timezone.utc)
        assert _stat_canon(str(b_utc)) == _probe_safe(b)

    @given(
        v=st.one_of(
            st.integers(),
            st.floats(allow_nan=False, allow_infinity=False),
            st.text(max_size=20),
        )
    )
    @settings(max_examples=100, deadline=None)
    def test_non_temporal_probes_pass_through(self, v):
        from philotes_spark.sources.snapshots import _probe_safe

        assert _probe_safe(v) is v


class TestWhereScopeSplitter:
    """The r15 tokenizer-first AND/OR splitter: string literals and
    parenthesized groups shield their contents; rejoining the parts
    with the split word reproduces the input."""

    _lit = st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd", "Zs"),
            whitelist_characters=" ANDORand()<>=",
        ),
        max_size=24,
    )

    @given(s=_lit, word=st.sampled_from(["AND", "OR"]))
    @settings(max_examples=200, deadline=None)
    def test_literal_contents_never_split(self, s, word):
        from philotes_spark.sql_frontend import _split_word_top

        frag = f"k = '{s}'"
        assert _split_word_top(frag, word) == [frag]

    @given(
        parts=st.lists(
            st.sampled_from(
                ["k >= 5", "g = 'x AND y'", "(a = 1 AND b = 2)",
                 "d IN (1, 2)", "v <= 'p OR q'"]
            ),
            min_size=1,
            max_size=5,
        ),
        word=st.sampled_from(["AND", "OR"]),
    )
    @settings(max_examples=200, deadline=None)
    def test_split_rejoin_round_trips(self, parts, word):
        from philotes_spark.sql_frontend import _split_word_top

        joined = f" {word} ".join(parts)
        got = _split_word_top(joined, word)
        assert [p.strip() for p in got] == [p.strip() for p in parts]
        assert f" {word} ".join(got).replace(" ", "") == joined.replace(
            " ", ""
        )
