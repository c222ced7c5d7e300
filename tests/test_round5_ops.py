"""Round-4 continuation (session 6) operator tests: temperature-based
domain re-mixing, BPE tokenizer training/encoding, GIF codec."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ---------------------------------------------------------------- splits


def test_temperature_sample_flattens_and_is_stable(ray_session):
    """alpha<1 up-weights rare groups relative to their raw share; the
    output is partitioning-independent and per-group sizes follow the
    closed-form n_g = min(c_g, floor(total * c^a / sum c^a))."""
    import ray.data

    from tenzir_ray.stages.splits import temperature_sample

    rng = np.random.default_rng(11)
    n_rows = 8_000
    tbl = pa.table({
        "id": np.arange(n_rows, dtype=np.int64),
        "g": rng.choice(["big", "mid", "small"],
                        p=[0.8, 0.18, 0.02], size=n_rows),
    })
    full = tbl.to_pandas().groupby("g").size()

    def run(parts):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        return (temperature_sample(ds, by="g", key="id",
                                   total=1000, alpha=0.5)
                .to_pandas().sort_values(["g", "id"], ignore_index=True))

    a, b = run(3), run(13)
    assert a.equals(b)

    w = np.sqrt(full.to_numpy(dtype=np.float64))
    expect = {
        g: min(int(c), int(np.floor(1000 * wi / w.sum())))
        for g, c, wi in zip(full.index, full.to_numpy(), w)
    }
    assert a.groupby("g").size().to_dict() == expect
    # flattening: the big group's share shrank vs its raw share
    raw_share = full["big"] / n_rows
    new_share = expect["big"] / sum(expect.values())
    assert new_share < raw_share
    # rare group over-represented vs raw share
    assert expect["small"] / sum(expect.values()) > full["small"] / n_rows


def test_temperature_sample_alpha_one_keeps_proportions(ray_session):
    import ray.data

    from tenzir_ray.stages.splits import temperature_sample

    tbl = pa.table({
        "id": np.arange(1000, dtype=np.int64),
        "g": ["a"] * 900 + ["b"] * 100,
    })
    ds = ray.data.from_arrow(tbl)
    out = temperature_sample(ds, by="g", key="id", total=500,
                             alpha=1.0).to_pandas()
    sizes = out.groupby("g").size().to_dict()
    assert sizes == {"a": 450, "b": 50}


# ------------------------------------------------------------------- bpe


def _naive_bpe(word_counts: dict, num_merges: int) -> list:
    """Reference trainer: recount EVERY pair from scratch each
    iteration (Sennrich'15 pseudocode, no incremental bookkeeping)."""
    from collections import Counter

    from tenzir_ray.stages.bpe import EOW, _apply_merge

    words = {i: tuple(w) + (EOW,) for i, w in enumerate(word_counts)}
    counts = {i: c for i, c in enumerate(word_counts.values())}
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for i, syms in words.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += counts[i]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_sym = best[0] + best[1]
        words = {i: _apply_merge(s, best, new_sym)
                 for i, s in words.items()}
    return merges


def test_train_merges_matches_naive_reference():
    from tenzir_ray.stages.bpe import train_merges

    rng = np.random.default_rng(7)
    vocab = ["".join(rng.choice(list("abcdef"), size=rng.integers(1, 9)))
             for _ in range(300)]
    wc = {w: int(rng.integers(1, 50)) for w in dict.fromkeys(vocab)}
    fast = train_merges(wc.items(), 60)
    slow = _naive_bpe(wc, 60)
    assert fast == slow


def test_bpe_roundtrip_and_compression():
    from tenzir_ray.stages.bpe import BpeModel, train_merges

    corpus = ("the quick brown fox jumps over the lazy dog " * 20
              + "pack my box with five dozen liquor jugs " * 10).split()
    wc: dict = {}
    for w in corpus:
        wc[w] = wc.get(w, 0) + 1
    m0 = BpeModel(train_merges(wc.items(), 0))
    m50 = BpeModel(train_merges(wc.items(), 50))
    text = "the quick brown fox packs liquor"
    assert m50.decode(m50.encode_text(text)) == text
    assert len(m50.encode_text(text)) < len(m0.encode_text(text))
    # a very frequent word collapses to one token
    assert m50.encode_word("the") == ["the" + "</w>"]


def test_bpe_train_distributed_partitioning_independent(ray_session):
    import ray.data

    from tenzir_ray.stages import bpe

    rng = np.random.default_rng(3)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 12)))
             for _ in range(400)]
    tbl = pa.table({"doc_id": np.arange(400, dtype=np.int64),
                    "text": texts})

    def run(parts):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        return bpe.bpe_train(ds, num_merges=40).merges

    assert run(2) == run(11)


def test_bpe_encode_counts_match_driver_encode(ray_session):
    import ray.data

    from tenzir_ray.stages import bpe

    texts = ["hello world  hello", "", "  spaced  out  ", None,
             "hello hello hello world"]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    ds = ray.data.from_arrow(tbl)
    model = bpe.bpe_train(ds, num_merges=30)
    out = (bpe.bpe_encode(ds, model, mode="count", out="n")
           .to_pandas().sort_values("doc_id", ignore_index=True))
    fresh = bpe.BpeModel(model.merges)  # cold cache on the driver
    for i, t in enumerate(texts):
        expect = len(fresh.encode_text(t or ""))
        assert out.loc[i, "n"] == expect, (i, t)
    toks = (bpe.bpe_encode(ds, model, mode="tokens", out="tk")
            .to_pandas().sort_values("doc_id", ignore_index=True))
    for i, t in enumerate(texts):
        assert list(toks.loc[i, "tk"]) == fresh.encode_text(t or "")


# ------------------------------------------------------------------- gif


def test_gif_roundtrip_lossless_and_posterize():
    from tenzir_ray.stages.gif import decode_gif, encode_gif, gif_frames

    rng = np.random.default_rng(0)
    pal = rng.integers(0, 256, size=(200, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 200, size=(100, 150))]
    out = decode_gif(encode_gif(img))
    assert out.shape == (100, 150, 3)
    assert np.array_equal(out, img)  # lossless: exercises 12-bit codes

    frames = [pal[rng.integers(0, 200, size=(40, 60))] for _ in range(5)]
    dec = list(gif_frames(encode_gif(frames)))
    assert len(dec) == 5
    for a, b in zip(dec, frames):
        assert np.array_equal(a, b)

    # >256 colors: documented 3-3-2 posterize fallback, bounded error
    noisy = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    o = decode_gif(encode_gif(noisy))
    assert np.abs(o.astype(int) - noisy.astype(int)).mean() < 30


def _gif_blocks(w, h, gct, images):
    """Hand-assemble a GIF89a from (indices, gce_bytes|None, ipacked)
    triples — lets tests exercise interlace/transparency/disposal paths
    the encoder doesn't emit."""
    import struct

    from tenzir_ray.stages.gif import _lzw_encode

    bits = max(1, int(np.ceil(np.log2(len(gct)))))
    n = 1 << bits
    full = np.zeros((n, 3), np.uint8)
    full[:len(gct)] = gct
    out = bytearray(b"GIF89a") + struct.pack("<HH", w, h)
    out.append(0x80 | (bits - 1))
    out += b"\x00\x00" + full.tobytes()
    for idx, gce, ipacked in images:
        if gce is not None:
            out += b"\x21\xf9" + bytes([len(gce)]) + gce + b"\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        out.append(ipacked)
        mc = max(2, bits)
        out.append(mc)
        lzw = _lzw_encode(np.asarray(idx, np.uint8).reshape(-1), mc)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def test_gif_interlace_transparency_disposal():
    from tenzir_ray.stages.gif import gif_frames

    gct = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                   np.uint8)
    # --- interlace: stored rows are in 4-pass order
    h, w = 10, 4
    disp = np.arange(h, dtype=np.uint8)[:, None].repeat(w, 1) % 4
    order = [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    stored = disp[order]
    data = _gif_blocks(w, h, gct, [(stored, None, 0x40)])
    frame = next(iter(gif_frames(data)))
    assert np.array_equal(frame, gct[disp])

    # --- transparency: frame 2's transparent pixels show frame 1
    full0 = np.zeros((4, 4), np.uint8)           # all red
    f2 = np.full((4, 4), 3, np.uint8)            # transparent idx 3
    f2[:2] = 1                                   # top half green
    gce = bytes([0x01, 0, 0, 3])                 # transparent flag, idx 3
    data = _gif_blocks(4, 4, gct, [(full0, None, 0), (f2, gce, 0)])
    frames = list(gif_frames(data))
    assert np.array_equal(frames[0], gct[full0])
    expect = gct[np.where(f2 == 3, full0, f2)]
    assert np.array_equal(frames[1], expect)

    # --- disposal 2 (restore to background color = index 0)
    gce_d2 = bytes([0x02 << 2, 0, 0, 0])
    f1 = np.full((4, 4), 2, np.uint8)            # blue frame
    f2t = np.full((4, 4), 3, np.uint8)           # fully transparent
    gce_t = bytes([0x01, 0, 0, 3])
    data = _gif_blocks(4, 4, gct, [(f1, gce_d2, 0), (f2t, gce_t, 0)])
    frames = list(gif_frames(data))
    assert np.array_equal(frames[0], gct[f1])
    # after disposal 2 the canvas is bg (palette idx 0 = red)
    assert np.array_equal(frames[1], gct[np.zeros((4, 4), np.uint8)])


def test_gif_through_multimodal_stages(ray_session):
    import ray.data

    from tenzir_ray.stages.gif import decode_gif, encode_gif
    from tenzir_ray.stages.multimodal import (
        decode_images, resize_images, sample_frames)

    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    imgs = [pal[rng.integers(0, 16, size=(20 + i, 30))] for i in range(4)]
    tbl = pa.table({
        "media_id": pa.array(range(4), pa.int64()),
        "payload": pa.array([encode_gif(im) for im in imgs], pa.binary()),
    })
    ds = ray.data.from_arrow(tbl)
    dec = decode_images(ds).to_pandas().sort_values("media_id")
    assert dec["height"].tolist() == [20, 21, 22, 23]
    assert dec["width"].tolist() == [30, 30, 30, 30]
    assert dec["channels"].tolist() == [3, 3, 3, 3]

    rs = resize_images(ds, 8, 8).to_pandas().sort_values("media_id")
    for p in rs["payload"]:
        img = decode_gif(bytes(p))
        assert img.shape == (8, 8, 3)

    anim = pa.table({
        "media_id": pa.array([7], pa.int64()),
        "payload": pa.array(
            [encode_gif([pal[np.full((6, 6), i % 16)] for i in range(5)])],
            pa.binary()),
    })
    fr = (sample_frames(ray.data.from_arrow(anim), every_n=2, fake=False)
          .to_pandas())
    assert fr["frame_idx"].tolist() == [0, 2, 4]
    assert fr["height"].tolist() == [6, 6, 6]


# ------------------------------------------------------- rollup / cube


def test_grouping_sets_levels_match_summarize(ray_session):
    """Every level of a grouping_sets result equals an independent
    summarize at that grouping; the grand total row aggregates all."""
    import ray.data

    from tenzir_ray.stages.summarize import grouping_sets, summarize

    rng = np.random.default_rng(2)
    n = 4000
    tbl = pa.table({
        "a": rng.choice(["x", "y", "z"], size=n),
        "b": rng.integers(0, 4, size=n).astype(np.int64),
        "v": rng.integers(0, 100, size=n).astype(np.int64),
    })
    ds = ray.data.from_arrow(tbl)
    out = grouping_sets(
        ds, [["a", "b"], ["a"], []], grouping_id="gid",
        n="count(*)", s="sum(v)", mn="min(v)", m="mean(v)",
    ).to_pandas()

    fine = summarize(ray.data.from_arrow(tbl), by=["a", "b"],
                     n="count(*)", s="sum(v)", mn="min(v)",
                     m="mean(v)").to_pandas()
    lvl0 = out[out.gid == 0].drop(columns=["gid"]).sort_values(
        ["a", "b"], ignore_index=True)
    fine = fine.sort_values(["a", "b"], ignore_index=True)
    pd.testing.assert_frame_equal(
        lvl0.astype({"b": "int64"}), fine, check_dtype=False)

    lvl1 = out[out.gid == 1]
    assert lvl1["b"].isna().all() and len(lvl1) == 3
    total = out[out.gid == 3]
    assert len(total) == 1
    assert int(total["n"].iloc[0]) == n
    assert int(total["s"].iloc[0]) == int(tbl["v"].to_pandas().sum())
    assert abs(float(total["m"].iloc[0])
               - tbl["v"].to_pandas().mean()) < 1e-9


def test_rollup_and_cube_set_shapes(ray_session):
    import ray.data

    from tenzir_ray.stages.summarize import cube, rollup

    tbl = pa.table({
        "a": ["p", "p", "q", "q"],
        "b": [1, 2, 1, 2],
        "v": [10, 20, 30, 40],
    })
    ds = ray.data.from_arrow(tbl)
    r = rollup(ds, ["a", "b"], grouping_id="g", s="sum(v)").to_pandas()
    # 4 detail + 2 per-a + 1 total
    assert sorted(r["g"].tolist()) == [0, 0, 0, 0, 1, 1, 3]
    assert int(r.loc[r.g == 3, "s"].iloc[0]) == 100

    c = cube(ray.data.from_arrow(tbl), ["a", "b"], grouping_id="g",
             s="sum(v)").to_pandas()
    # 4 detail + 2 per-a + 2 per-b + 1 total
    assert sorted(c["g"].tolist()) == [0, 0, 0, 0, 1, 1, 2, 2, 3]
    per_b = c[c.g == 2].set_index("b")["s"]
    assert int(per_b[1]) == 40 and int(per_b[2]) == 60

    with pytest.raises(ValueError):
        rollup(ds, ["a"], med="median(v)")


# ------------------------------------------------------ context windows


def test_context_windows_matches_pandas_reference(ray_session):
    import ray.data

    from tenzir_ray.stages.transcripts import context_windows

    rng = np.random.default_rng(9)
    rows = []
    for c in range(30):
        for t in range(int(rng.integers(1, 9))):
            rows.append((f"c{c}", t, f"text-{c}-{t}"))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    # shuffle input: encounter order must not matter
    shuffled = df.sample(frac=1.0, random_state=1, ignore_index=True)
    ds = ray.data.from_pandas(shuffled).repartition(7)
    out = (context_windows(ds, k=3, sep="|")
           .to_pandas().sort_values(["conv_id", "turn_idx"],
                                    ignore_index=True))

    def ref(group):
        texts = group["text"].tolist()
        ctxs = []
        for i in range(len(texts)):
            window = texts[max(0, i - 3):i]
            ctxs.append("|".join(window) if window else None)
        return pd.Series(ctxs, index=group.index)

    expect = df.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    expect["context"] = (expect.groupby("conv_id", group_keys=False)
                         .apply(ref, include_groups=False))
    assert out["context"].tolist() == expect["context"].tolist()
    # first turn of every conversation has no context
    firsts = out[out.turn_idx == 0]
    assert firsts["context"].isna().all()


# -------------------------------------------------- conditional exprs


def test_iif_coalesce_ternary_exprs(ray_session):
    import ray.data

    from tenzir_ray.stages.transforms import select, set_

    tbl = pa.table({"id": [1, 2, 3],
                    "v": pa.array([10.0, None, 30.0], pa.float64())})
    ds = set_(ray.data.from_arrow(tbl),
              band="iif(v > 15.0, 'hi', 'lo')",
              filled="coalesce(v, 0.0)",
              tern="v * 2 if v > 15.0 else 0.0")
    out = select(ds, ["id", "band", "filled", "tern"]).to_pandas()
    out = out.sort_values("id", ignore_index=True)
    assert out["band"].tolist() == ["lo", None, "hi"]  # if_else null-in
    assert out["filled"].tolist() == [10.0, 0.0, 30.0]
    assert out["tern"].tolist()[0] == 0.0
    assert out["tern"].tolist()[2] == 60.0


# ----------------------------------------------------- exact quantiles


def test_group_quantiles_matches_duckdb_and_null_groups(ray_session):
    import duckdb
    import ray.data

    from tenzir_ray.stages.summarize import group_quantiles

    rng = np.random.default_rng(6)
    n = 3000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c", "d"], size=n),
        "v": rng.normal(size=n),
    })
    df.loc[df.sample(frac=0.05, random_state=0).index, "v"] = np.nan
    allnull = pd.DataFrame({"g": ["z"] * 5, "v": [np.nan] * 5})
    df = pd.concat([df, allnull], ignore_index=True)

    out = (group_quantiles(ray.data.from_pandas(df).repartition(5),
                           by="g", column="v",
                           quantiles={"p10": 0.1, "p50": 0.5, "p99": 0.99})
           .to_pandas().sort_values("g", ignore_index=True))
    want = duckdb.sql("""
        SELECT g, quantile_disc(v, 0.1) p10, quantile_disc(v, 0.5) p50,
               quantile_disc(v, 0.99) p99
        FROM df GROUP BY g ORDER BY g""").df()
    assert out["g"].tolist() == want["g"].tolist()
    for c in ("p10", "p50", "p99"):
        a, b = out[c].to_numpy(), want[c].to_numpy()
        both_nan = pd.isna(a) & pd.isna(b)
        assert np.all(both_nan | (a == b)), c
    # the all-null group survives with NULL quantiles
    assert pd.isna(out.loc[out.g == "z", "p50"]).all()


# --------------------------------------------------------- naive bayes


def _nb_corpus(n=600, seed=8):
    rng = np.random.default_rng(seed)
    vocab = {
        "sport": ["goal", "match", "team", "score", "league", "coach"],
        "tech": ["code", "server", "model", "data", "deploy", "bug"],
        "food": ["bake", "salt", "oven", "flour", "taste", "sauce"],
    }
    shared = ["the", "a", "of", "and"]
    rows = []
    for i in range(n):
        lab = ["sport", "tech", "food"][i % 3]
        words = list(rng.choice(vocab[lab], size=8)) + list(
            rng.choice(shared, size=4))
        rng.shuffle(words)
        rows.append((i, lab, " ".join(words)))
    return pd.DataFrame(rows, columns=["doc_id", "lang", "text"])


def test_nb_train_classify_accuracy_and_stability(ray_session):
    import ray.data

    from tenzir_ray.stages.classify import nb_classify, nb_train

    df = _nb_corpus()

    def run(parts):
        ds = ray.data.from_pandas(df).repartition(parts)
        model = nb_train(ds, "lang", buckets=512)
        out = (nb_classify(ds, model, score_col="conf")
               .to_pandas().sort_values("doc_id", ignore_index=True))
        return model, out

    m1, o1 = run(2)
    m2, o2 = run(9)
    assert m1.classes == m2.classes == ["food", "sport", "tech"]
    assert np.array_equal(m1.counts, m2.counts)  # partition-independent
    assert o1["pred"].tolist() == o2["pred"].tolist()
    acc = (o1["pred"] == df.sort_values("doc_id")["lang"]).mean()
    assert acc > 0.95, acc
    assert (m1.doc_counts == 200).all()


def test_nb_model_roundtrip_and_empty_text(ray_session):
    import ray.data

    from tenzir_ray.stages.classify import NbModel, nb_classify, nb_train

    df = _nb_corpus(90)
    ds = ray.data.from_pandas(df)
    model = nb_train(ds, "lang", buckets=256)
    again = NbModel.from_dict(model.to_dict())
    assert np.allclose(model.logw, again.logw)

    weird = pd.DataFrame({"doc_id": [0, 1], "text": ["", "goal match"]})
    out = (nb_classify(ray.data.from_pandas(weird), model)
           .to_pandas().sort_values("doc_id"))
    # empty text falls back to the prior argmax (uniform → first class)
    assert out["pred"].iloc[0] == "food"
    assert out["pred"].iloc[1] == "sport"


def test_gopher_quality_rules(ray_session):
    import ray.data

    from tenzir_ray.stages.text import gopher_quality

    passing = ("the quick brown fox jumps over a lazy dog and then "
               "we have to be sure that this document has quite enough "
               "words of ordinary length to clear rule one with room "
               "to spare so it keeps going on and on with plain text "
               "sentences that look like real writing would look")
    rows = [
        {"doc_id": 1, "text": passing},                      # all rules pass
        {"doc_id": 2, "text": "too short"},                  # rule 1
        {"doc_id": 3, "text": ("# " * 60) + passing},        # rule 3 symbols
        {"doc_id": 4, "text": "\n".join("- item" for _ in range(20))},
        {"doc_id": 5, "text": None},                         # null text
    ]
    out = (gopher_quality(ray.data.from_items(rows))
           .to_pandas().sort_values("doc_id", ignore_index=True))
    assert out["gopher_pass"].tolist() == [True, False, False, False, False]
    assert out.loc[0, "wc"] >= 50 and out.loc[0, "stop_hits"] >= 2
    assert out.loc[2, "symbol_ratio"] > 0.1
    assert out.loc[3, "bullet_frac"] >= 0.9
    assert out.loc[4, "wc"] == 0


def test_gopher_tokenizer_matches_re2_whitespace(ray_session):
    """Engine word counts must agree with the RE2 \\s oracle on bytes
    Python treats as whitespace but RE2 does not (\\x0b, NBSP, U+3000)."""
    import duckdb
    import ray.data

    from tenzir_ray.stages.text import gopher_quality

    rows = [{"doc_id": i, "text": t} for i, t in enumerate([
        "one two\x0bthree four",       # \x0b: one token 'two\x0bthree'
        "a\xa0b c",                    # NBSP inside a token
        "x　y z",                  # ideographic space
        "line one\n still line",  # U+2028 not a \n line break
        "plain words only here",
    ])]
    out = (gopher_quality(ray.data.from_items(rows))
           .to_pandas().sort_values("doc_id", ignore_index=True))
    ora = duckdb.sql("""
        SELECT doc_id, len(list_filter(string_split_regex(text, '\\s+'),
                           x -> x <> '')) AS wc
        FROM (SELECT UNNEST($rows, recursive := true))
        ORDER BY doc_id
    """, params={"rows": rows}).df()
    assert out["wc"].tolist() == ora["wc"].tolist()
