"""Property-based tests (hypothesis) for the pure planning/translation
layers — the reference's fiddliest string/math code paths, exercised
over generated inputs rather than a handful of examples."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from sparksync.render import render_value
from sparksync.source import plan_pages
from sparksync.typemap import OracleColumn, clamp_scale, map_type, normalize_default


@given(count=st.integers(0, 200_000), page=st.integers(1, 1_000_000))
@settings(max_examples=200, deadline=None)
def test_page_windows_partition_rowspace(count, page):
    """Windows are 1-based, contiguous, non-overlapping and cover
    exactly [1, count] (ceil math, cmd/root.go:320-335)."""
    plan = plan_pages(count, "t", page)
    ws = plan.windows()
    assert plan.num_pages == max(1, -(-count // page))
    assert len(ws) == plan.num_pages
    lo0, _ = ws[0]
    assert lo0 == 1
    covered = 0
    prev_hi = 0
    for lo, hi in ws:
        assert lo == prev_hi + 1
        assert hi <= count or count == 0
        covered += max(0, hi - lo + 1)
        prev_hi = hi
    assert covered == count


@given(
    precision=st.one_of(st.none(), st.integers(0, 60)),
    scale=st.one_of(st.none(), st.integers(-20, 60)),
    avg_len=st.one_of(st.none(), st.integers(0, 30)),
)
@settings(max_examples=200)
def test_number_mapping_total_and_valid(precision, scale, avg_len):
    """Every NUMBER shape maps to a legal MySQL type: decimal scale is
    clamped to [0, 30] and precision to <= 65 (tablemeta.go:74,133-158)."""
    col = OracleColumn(
        "c", "NUMBER", precision=precision, scale=scale, avg_col_len=avg_len
    )
    mysql, spark = map_type(col)
    assert mysql
    if mysql.startswith("decimal"):
        p, s = mysql[len("decimal(") : -1].split(",")
        assert 1 <= int(p) <= 65
        assert 0 <= int(s) <= 30
        assert int(s) <= int(p)


@given(
    precision=st.one_of(st.none(), st.integers(0, 60)),
    scale=st.one_of(st.none(), st.integers(-100, 127)),
)
def test_clamp_scale_bounds(precision, scale):
    out = clamp_scale(precision, scale)
    if scale is None:
        assert out is None
    else:
        assert out <= 30


@given(
    default=st.one_of(
        st.none(),
        st.text(max_size=40),
        st.text(max_size=20).map(lambda s: f"('{s}')"),
    )
)
@settings(max_examples=200)
def test_normalize_default_never_raises_and_shapes(default):
    col = OracleColumn("c", "VARCHAR2", default=default)
    out = normalize_default(col)
    assert out == "" or out.startswith(" default ")


@given(
    v=st.one_of(
        st.none(),
        st.booleans(),
        st.integers(),
        st.floats(allow_nan=False),
        st.text(max_size=50),
        st.binary(max_size=20),
        st.lists(st.integers(), max_size=5),
    )
)
@settings(max_examples=200)
def test_render_value_total(v):
    out = render_value(v)
    assert isinstance(out, str)


@given(
    costs=st.lists(st.integers(1, 500), max_size=200),
    budget=st.integers(1, 1000),
)
@settings(max_examples=300, deadline=None)
def test_greedy_pack_invariants(costs, budget):
    """Packing recurrence (ext/sampling.greedy_pack): sequence ids are
    non-decreasing from 0; offsets restart at 0 per sequence and equal
    the running fill; no sequence exceeds budget unless it holds a
    single oversized item; nothing is lost or reordered."""
    from sparksync.ext.sampling import greedy_pack

    seq_ids, offsets = greedy_pack(costs, budget)
    assert len(seq_ids) == len(offsets) == len(costs)
    fills: dict[int, int] = {}
    counts: dict[int, int] = {}
    prev_seq = 0
    for s, o, c in zip(seq_ids, offsets, costs):
        assert s >= prev_seq  # never goes back
        assert s - prev_seq <= 1  # never skips a sequence
        prev_seq = s
        assert o == fills.get(s, 0)
        fills[s] = fills.get(s, 0) + c
        counts[s] = counts.get(s, 0) + 1
    for s, fill in fills.items():
        assert fill <= budget or counts[s] == 1
    # greedy tightness: consecutive sequences couldn't be merged
    for s in range(1, len(fills)):
        first_cost = next(c for sq, c in zip(seq_ids, costs) if sq == s)
        assert fills[s - 1] + first_cost > budget


def test_merge_cdc_matches_python_model(spark):
    """Seeded randomized scenarios replayed against a dict-based model:
    apply changes in seq order per key (latest wins), delete removes —
    the Spark result must equal the model exactly."""
    import random

    from sparksync.compare import merge_cdc

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        target_rows = [(k, f"v{k}") for k in range(20) if rng.random() < 0.7]
        changes = []
        for seq in range(30):
            k = rng.randrange(30)
            op = rng.choice(["I", "U", "D"])
            changes.append((k, None if op == "D" else f"c{seq}", op, seq))
        model = dict(target_rows)
        latest: dict[int, tuple] = {}
        for k, v, op, seq in changes:
            latest[k] = (v, op, seq)  # seq strictly increasing -> last wins
        for k, (v, op, _seq) in latest.items():
            if op == "D":
                model.pop(k, None)
            else:
                model[k] = v
        t = spark.createDataFrame(target_rows, "id long, val string")
        c = spark.createDataFrame(changes, "id long, val string, op string, seq long")
        got = {(r["id"], r["val"]) for r in merge_cdc(t, c, ["id"], seq_col="seq").collect()}
        assert got == set(model.items()), f"seed {seed}"


def test_budget_mix_matches_python_model(spark):
    """The admitted set equals the Python replay of the Knuth-ordered
    greedy admission, for several seeds and budget mixes."""
    import random

    from sparksync.ext.sampling import _KNUTH_A, BUCKETS, budget_mix

    for seed in (3, 9):
        rng = random.Random(seed)
        rows = [
            (i, rng.choice(["a", "b", "c"]), "w " * rng.randrange(1, 9))
            for i in range(120)
        ]
        budgets = {"a": 40, "b": 15}
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        got = {(r["doc_id"], r["cum_tokens"]) for r in
               budget_mix(df, "source", budgets, "doc_id").collect()}
        model = set()
        for grp, budget in budgets.items():
            ordered = sorted(
                (r for r in rows if r[1] == grp),
                key=lambda r: ((r[0] * _KNUTH_A) % BUCKETS, r[0]),
            )
            cum = 0
            for doc_id, _g, text in ordered:
                n = len([t for t in text.split(" ") if t])
                cum += n
                if cum > budget:
                    break
                model.add((doc_id, cum))
        assert got == model, f"seed {seed}"


@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip_any_shape(h, w, seed):
    """emit_bmp . parse_bmp == identity for every (h, w) — including
    the widths whose rows need 4-byte padding, the classic BMP bug."""
    import numpy as np

    from sparksync.ext import multimodal as mm

    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (mm.parse_bmp(mm.emit_bmp(a)) == a).all()


@given(
    n=st.integers(0, 500),
    sr=st.integers(1, 96_000),
    ch=st.integers(1, 2),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_features(n, sr, ch, seed):
    """A synthesized PCM16 WAV parses back to the exact samples and
    yields duration = frames/rate; corrupt truncations never raise
    anything but ValueError (the class media_features catches)."""
    import struct as st2

    import numpy as np

    from sparksync.ext import multimodal as mm

    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32767, size=n * ch, dtype="<i2").tobytes()
    wav = (
        b"RIFF" + st2.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + st2.pack("<IHHIIHH", 16, 1, ch, sr, sr * 2 * ch, 2 * ch, 16)
        + b"data" + st2.pack("<I", len(pcm)) + pcm
    )
    got_sr, got_ch, s = mm.parse_wav(wav)
    assert (got_sr, got_ch) == (sr, ch) and len(s) == n * ch
    f = mm.wav_features(wav)
    assert abs(f["duration_s"] - n / sr) < 1e-12
    # truncation at any prefix either parses or raises ValueError only
    cut = wav[: len(wav) // 2]
    try:
        mm.parse_wav(cut)
    except ValueError:
        pass


@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    c=st.sampled_from([3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_png_roundtrip_any_shape(h, w, c, seed):
    """emit_png |> parse_png is the identity for any 8-bit RGB/RGBA
    array — dimensions, channel count, every pixel."""
    import numpy as np

    from sparksync.ext.multimodal import emit_png, parse_png

    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    assert (parse_png(emit_png(a)) == a).all()


@given(
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    ncolors=st.integers(1, 256),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_gif_roundtrip_any_palette(h, w, ncolors, seed):
    """emit_gif |> parse_gif is the identity for any image with <=256
    distinct colors, across palette sizes spanning every LZW min code
    size."""
    import numpy as np

    from sparksync.ext.multimodal import emit_gif, parse_gif

    rng = np.random.default_rng(seed)
    colors = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    a = colors[rng.integers(0, ncolors, (h, w))]
    assert (parse_gif(emit_gif(a)) == a).all()


@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ss=st.sampled_from(["444", "420", "422"]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=15, deadline=None)
def test_jpeg_roundtrip_smooth_bounded(h, w, ss, seed):
    """emit_jpeg |> parse_jpeg preserves shape for any size/subsampling
    and reconstructs low-frequency content within a small bound (JPEG
    is lossy; solid blocks are its best case)."""
    import numpy as np

    from sparksync.ext.jpeg import emit_jpeg, parse_jpeg

    rng = np.random.default_rng(seed)
    color = rng.integers(0, 256, 3)
    a = np.full((h, w, 3), color, dtype=np.uint8)
    d = parse_jpeg(emit_jpeg(a, quality=92, subsampling=ss))
    assert d.shape == a.shape
    assert np.abs(d.astype(int) - a.astype(int)).max() <= 2


@given(
    h=st.integers(1, 28),
    w=st.integers(1, 28),
    quality=st.integers(10, 95),
    seed=st.integers(0, 2**31 - 1),
    ss=st.sampled_from(["444", "420", "422"]),
    dri=st.sampled_from([0, 1, 3]),
)
@settings(max_examples=15, deadline=None)
def test_jpeg_progressive_baseline_parity_property(h, w, quality, seed, ss, dri):
    """For ANY image content, size, and quality: the progressive
    encoder's scans carry the same quantized coefficients as the
    baseline encoder, so decoded pixels must be BIT-IDENTICAL between
    the two scan structures (random noise maximizes AC-refinement
    stress: EOB runs, correction bits, ZRL spans)."""
    import numpy as np

    from sparksync.ext.jpeg import (
        emit_jpeg,
        emit_progressive_jpeg,
        parse_jpeg,
    )

    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    base = parse_jpeg(emit_jpeg(a, quality=quality, subsampling=ss))
    prog = parse_jpeg(
        emit_progressive_jpeg(
            a, quality=quality, subsampling=ss, restart_interval=dri
        )
    )
    assert np.array_equal(base, prog)


def test_decontaminate_trim_matches_python_model(spark):
    """Seeded randomized corpora replayed against a pure-Python model
    of the full decontamination-trim rule (X204/q208): plant random
    benchmark snippets into random training docs, then — model side —
    enumerate every (bench, train) diagonal streak of shared 5-grams,
    keep maximal runs >= 12 tokens, union the victim spans per train
    doc, and rebuild. The winnow guarantee (min_shared=1, w=8, k=5)
    makes engine detection EXACT at min_run >= 12, so the Spark result
    must equal the all-pairs model exactly — token counts, trim
    counts, and rebuilt text."""
    import random
    from collections import defaultdict

    from sparksync.ext.dedup import decontaminate_trim

    K, MIN_RUN = 5, 12

    def spans_between(B, T):
        grams_b = defaultdict(list)
        for i in range(len(B) - K + 1):
            grams_b[tuple(B[i:i + K])].append(i)
        diag = defaultdict(list)
        for j in range(len(T) - K + 1):
            for i in grams_b.get(tuple(T[j:j + K]), ()):
                diag[i - j].append(j)
        out = []
        for js in diag.values():
            js = sorted(js)
            s = prev = js[0]
            for j in js[1:] + [None]:
                if j is not None and j == prev + 1:
                    prev = j
                    continue
                run = prev - s + K  # streak length + k - 1 tokens
                if run >= MIN_RUN:
                    out.append((s, s + run - 1))
                if j is not None:
                    s = prev = j
        return out

    for seed in (5, 23, 77):
        rng = random.Random(seed)
        alpha = [f"w{i}" for i in range(9)]
        bench_toks = {
            bid: [rng.choice(alpha) for _ in range(rng.randrange(15, 40))]
            for bid in (100, 200, 300)
        }
        train_toks = {}
        for tid in range(12):
            t = [rng.choice(alpha) for _ in range(rng.randrange(8, 50))]
            # plant 0-2 benchmark snippets of random (incl. sub-run) size
            for _ in range(rng.randrange(0, 3)):
                b = bench_toks[rng.choice([100, 200, 300])]
                ln = rng.randrange(6, len(b) + 1)
                st = rng.randrange(0, len(b) - ln + 1)
                pos = rng.randrange(0, len(t) + 1)
                t = t[:pos] + b[st:st + ln] + t[pos:]
            train_toks[tid] = t
        bench = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in bench_toks.items()],
            "doc_id long, text string",
        )
        train = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in train_toks.items()],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_tokens, r.n_trimmed, r.new_text)
            for r in decontaminate_trim(
                train, bench, min_run=MIN_RUN
            ).collect()
        }
        model = {}
        for tid, t in train_toks.items():
            cut = set()
            for b in bench_toks.values():
                for s, e in spans_between(b, t):
                    cut.update(range(s, e + 1))
            kept = [tok for p, tok in enumerate(t) if p not in cut]
            model[tid] = (len(t), len(cut), " ".join(kept))
        assert got == model, f"seed {seed}"


def test_self_trim_repeats_matches_python_model(spark):
    """Seeded random docs from a tiny alphabet (dense with natural
    short repeats) replayed against a pure-Python model of the
    within-doc rule (X205/q209): enumerate every i<j diagonal streak
    of shared 2-grams, keep maximal runs >= 3 tokens, union the
    victim spans, rebuild — the Spark result must match exactly."""
    import random
    from collections import defaultdict

    from sparksync.ext.dedup import self_trim_repeats

    K, MIN_RUN = 2, 3

    def model_trim(toks):
        grams = defaultdict(list)
        for i in range(len(toks) - K + 1):
            grams[tuple(toks[i:i + K])].append(i)
        diag = defaultdict(set)
        for ps in grams.values():
            for a in ps:
                for b in ps:
                    if a < b:
                        diag[b - a].add(b)
        cut = set()
        for js in diag.values():
            js = sorted(js)
            s = prev = js[0]
            for j in js[1:] + [None]:
                if j is not None and j == prev + 1:
                    prev = j
                    continue
                if prev - s + K >= MIN_RUN:
                    cut.update(range(s, prev + K))
                if j is not None:
                    s = prev = j
        kept = [t for p, t in enumerate(toks) if p not in cut]
        return len(toks), len(cut), " ".join(kept)

    for seed in (11, 42, 99):
        rng = random.Random(seed)
        alpha = ["a", "b", "c", "d"]  # tiny alphabet -> natural repeats
        docs = {
            i: [rng.choice(alpha) for _ in range(rng.randrange(4, 40))]
            for i in range(15)
        }
        df = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in docs.items()],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_tokens, r.n_trimmed, r.new_text)
            for r in self_trim_repeats(df, k=K, min_run=MIN_RUN).collect()
        }
        assert got == {i: model_trim(t) for i, t in docs.items()}, seed


def test_epoch_recipe_matches_python_model(spark):
    """Water-filling model check (X214): for a spread of corpus shapes
    and budgets, epoch_recipe's allocation equals a brute-force Python
    water-filler (binary search on the level), allocations sum to
    min(budget, total ceiling), and every source respects its cap."""
    import random

    from sparksync.ext.sampling import epoch_recipe

    rng = random.Random(13)
    for case in range(6):
        n_sources = rng.randint(1, 9)
        toks = {f"s{i}": rng.randint(1, 40) for i in range(n_sources)}
        max_epochs = rng.choice([1.0, 2.0, 4.0])
        budget = rng.randint(1, int(sum(toks.values()) * max_epochs * 1.5) + 1)
        rows = [
            (src, " ".join(f"w{src}_{j}" for j in range(n)))
            for src, n in toks.items()
        ]
        df = spark.createDataFrame(rows, "source string, text string")
        got = {
            r.source: r
            for r in epoch_recipe(df, budget, max_epochs).collect()
        }
        caps = {s: max_epochs * n for s, n in toks.items()}
        total_cap = sum(caps.values())
        if budget >= total_cap:
            want = dict(caps)
        else:
            lo, hi = 0.0, max(caps.values())
            for _ in range(200):  # binary search the water level
                mid = (lo + hi) / 2
                if sum(min(c, mid) for c in caps.values()) < budget:
                    lo = mid
                else:
                    hi = mid
            want = {s: min(c, hi) for s, c in caps.items()}
        assert set(got) == set(want), case
        for s in want:
            assert abs(got[s].allocated_tokens - want[s]) < 1e-6, (
                case, s, got[s].allocated_tokens, want[s])
            assert got[s].allocated_tokens <= caps[s] + 1e-9
            assert got[s].epochs <= max_epochs + 1e-9
        assert abs(
            sum(r.allocated_tokens for r in got.values())
            - min(budget, total_cap)
        ) < 1e-6, case


def test_recipe_mix_matches_python_model(spark):
    """End-to-end plan->execute model check (X218): for a spread of
    corpus shapes/budgets, recipe_mix's admitted set equals a pure
    Python replay of water-filling (binary search on the level) +
    floor-to-int budgets + Knuth-hash-ordered cumulative admission."""
    import math
    import random

    from sparksync.ext.sampling import BUCKETS, _KNUTH_A, recipe_mix

    rng = random.Random(41)
    for case in range(5):
        n_sources = rng.randint(1, 6)
        docs = []
        did = 0
        for i in range(n_sources):
            for _ in range(rng.randint(1, 12)):
                n = rng.randint(0, 15)
                docs.append((did, f"s{i}", " ".join(f"w{j}" for j in range(n))))
                did += 1
        max_epochs = rng.choice([1.0, 2.0])
        total = sum(len(t.split()) for _, _, t in docs)
        budget = rng.randint(1, int(total * max_epochs) + 5)
        df = spark.createDataFrame(docs, "doc_id long, source string, text string")
        got = {
            r.doc_id: (r.source, r.n_tokens, r.cum_tokens)
            for r in recipe_mix(
                df, budget, max_epochs, id_col="doc_id"
            ).collect()
        }

        # python water-filling
        toks = {}
        for _, s, t in docs:
            toks[s] = toks.get(s, 0) + len(t.split())
        caps = {s: max_epochs * n for s, n in toks.items()}
        if budget >= sum(caps.values()):
            alloc = dict(caps)
        else:
            lo, hi = 0.0, max(caps.values())
            for _ in range(200):
                mid = (lo + hi) / 2
                if sum(min(c, mid) for c in caps.values()) < budget:
                    lo = mid
                else:
                    hi = mid
            alloc = {s: min(c, hi) for s, c in caps.items()}
        budgets = {
            s: int(math.floor(a)) for s, a in alloc.items() if a > 0
        }
        # python admission in knuth order
        want = {}
        for s, b in budgets.items():
            members = sorted(
                ((d, t) for d, src, t in docs if src == s),
                key=lambda p: ((p[0] * _KNUTH_A) % BUCKETS, p[0]),
            )
            cum = 0
            for d, t in members:
                n = len(t.split())
                cum += n
                if cum <= b:
                    want[d] = (s, n, cum)
        # float water level vs engine can differ only at exact-tie
        # boundaries; the fixture generator avoids them (integer token
        # counts, 200-step bisection converges far past 1e-6)
        assert got == want, case


def test_domain_reweight_matches_python_model(spark):
    """MWU model check (X220): for random losses/domains, the engine's
    weights equal a pure Python replay of mean -> min-max z ->
    prior * (1 + eta*z) -> renormalize, and always form a
    distribution."""
    import random

    from sparksync.ext.sampling import domain_reweight

    rng = random.Random(7)
    for case in range(5):
        n_domains = rng.randint(1, 7)
        eta = rng.choice([0.0, 0.3, 1.0])
        rows = []
        for i in range(n_domains):
            for _ in range(rng.randint(1, 8)):
                rows.append((f"d{i}", round(rng.uniform(0, 10), 3)))
        df = spark.createDataFrame(rows, "source string, loss double")
        got = {r.source: r for r in domain_reweight(df, "loss", eta=eta).collect()}

        per = {}
        for s, l in rows:
            per.setdefault(s, []).append(l)
        mean = {s: sum(v) / len(v) for s, v in per.items()}
        lo, hi = min(mean.values()), max(mean.values())
        z = {s: ((m - lo) / (hi - lo) if hi > lo else 0.0) for s, m in mean.items()}
        prior = 1.0 / len(per)
        raw = {s: prior * (1.0 + eta * z[s]) for s in per}
        tot = sum(raw.values())
        want = {s: r / tot for s, r in raw.items()}
        assert set(got) == set(want), case
        for s in want:
            assert abs(got[s].weight - want[s]) < 1e-9, (case, s)
            assert abs(got[s].mean_loss - mean[s]) < 1e-9
        # the normalizer rides a decimal(38,12) accumulation, so the
        # distribution closes to 1 within the 1e-12-per-domain grid
        assert abs(sum(r.weight for r in got.values()) - 1.0) < 1e-9, case
