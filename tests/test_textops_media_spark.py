"""textops (lang-id, regex token count, winnowing) + media plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.media import byte_histogram_features, decode_image_meta, frame_sample, synth_media_df
from sketchlib.textops import (
    BPE_ISH_PATTERN,
    fit_language_profiles,
    lang_id_classify,
    lang_id_udf,
    token_count_col,
    winnow_fingerprints,
)


class TestLangId:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        # genuinely distinct character distributions per language
        texts = {
            "xx": "zzyzx zyx xyzzy yzz zxy zyzzyva xyz zzz yxz zyxx",
            "aa": "alfalfa banana cabana salad area arena anagram banal",
            "oo": "monsoon cocoon london wood door bosom crooks odor",
        }
        rows = []
        for lang, base in texts.items():
            words = base.split()
            for i in range(30):
                rows.append((lang, " ".join(words[(i + j) % len(words)] for j in range(8))))
        return spark.createDataFrame(rows, "lang string, text string").cache()

    def test_train_and_classify(self, spark, corpus):
        profiles = fit_language_profiles(corpus, "text", "lang", n=3, top=100)
        assert set(profiles) == {"xx", "aa", "oo"}
        clf = lang_id_udf(spark, profiles, n=3)
        pred = corpus.withColumn("pred", clf("text"))
        acc = pred.filter(F.col("pred") == F.col("lang")).count() / corpus.count()
        assert acc >= 0.95, acc

    def test_classify_dataframe_path(self, spark, corpus):
        ided = corpus.withColumn("doc_id", F.monotonically_increasing_id()).cache()
        profiles = fit_language_profiles(ided, "text", "lang", n=3, top=100)
        out = lang_id_classify(ided, "doc_id", "text", profiles, n=3)
        joined = ided.join(out, "doc_id")
        n = ided.count()
        assert out.count() == n  # one prediction per input row
        acc = joined.filter(F.col("pred") == F.col("lang")).count() / n
        assert acc >= 0.95, acc
        # agrees with the scalar-UDF convenience path row-for-row
        udf_pred = ided.withColumn("updf", lang_id_udf(spark, profiles, n=3)("text"))
        both = udf_pred.join(out, "doc_id")
        assert both.filter(F.col("pred") != F.col("updf")).count() == 0

    def test_classify_plan_has_no_python(self, spark, corpus):
        # the engine path must be whole-JVM: no Arrow/Batch Python eval,
        # no cartesian product, and the profile join must broadcast
        ided = corpus.withColumn("doc_id", F.monotonically_increasing_id())
        profiles = fit_language_profiles(ided, "text", "lang", n=3, top=100)
        out = lang_id_classify(ided, "doc_id", "text", profiles, n=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, plan
        assert "Cartesian" not in plan.replace("CartesianRDD", ""), plan
        assert "BroadcastHashJoin" in plan, plan

    def test_classify_no_gram_overlap_falls_to_first_lang(self, spark):
        df = spark.createDataFrame([(1, "qqqq www"), (2, "")], "doc_id long, text string")
        profiles = {"bb": {"aaa": 1.0}, "aa": {"zzz": 1.0}}
        got = {r.doc_id: r.pred for r in lang_id_classify(df, "doc_id", "text", profiles).collect()}
        assert got == {1: "aa", 2: "aa"}  # alphabetically-first language


class TestTokenCount:
    def test_matches_python_re(self, spark):
        import re

        samples = ["hello world42, foo-bar!", "a.b.c 123", "", "   ", "x"]
        df = spark.createDataFrame([(s,) for s in samples], "text string")
        got = [r[0] for r in df.select(token_count_col("text")).collect()]
        want = [len(re.findall(BPE_ISH_PATTERN, s)) for s in samples]
        assert got == want


class TestWinnowing:
    def test_shared_substring_shares_fingerprint(self, spark):
        # docs 1 and 2 share a 12-word run (>= window+k-1 = 6) → must
        # share at least one fingerprint; doc 3 is disjoint
        shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu".split()
        d1 = ["x1", "x2"] + shared + ["x3"]
        d2 = ["y1"] + shared + ["y2", "y3"]
        d3 = [f"z{i}" for i in range(15)]
        df = spark.createDataFrame(
            [(1, d1), (2, d2), (3, d3)], "doc_id long, words array<string>"
        )
        fps = winnow_fingerprints(df, "doc_id", "words", k=3, window=4)
        by_doc = {}
        for r in fps.collect():
            by_doc.setdefault(r.doc_id, set()).add(r.fp)
        assert by_doc[1] & by_doc[2]
        assert not (by_doc[1] & by_doc[3])
        assert not (by_doc[2] & by_doc[3])

    def test_determinism(self, spark, seq_small):
        df = seq_small.withColumn("w", F.transform("tokens", lambda t: t.cast("string"))).limit(50)
        a = sorted(map(tuple, winnow_fingerprints(df, "doc_id", "w").collect()))
        b = sorted(map(tuple, winnow_fingerprints(df, "doc_id", "w").collect()))
        assert a == b and len(a) > 0


class TestMedia:
    @pytest.fixture(scope="class")
    def media(self, spark):
        return synth_media_df(spark, 60, payload_bytes=1024, partitions=3).cache()

    def test_synth_shape(self, media):
        rows = media.collect()
        assert len(rows) == 60
        assert all(len(r.payload) == 1024 for r in rows)
        assert {r.kind for r in rows} == {"image", "audio", "video"}

    def test_byte_histogram(self, media):
        feat = byte_histogram_features(media)
        rows = feat.collect()
        assert all(len(r.features) == 32 for r in rows)
        s = sum(rows[0].features)
        assert abs(s - 1.0) < 1e-3  # L1-normalized
        # deterministic: same id → same features across runs
        again = {r.media_id: r.features for r in byte_histogram_features(media).collect()}
        assert again[rows[0].media_id] == rows[0].features

    def test_frame_sample(self, media):
        frames = frame_sample(media.filter("kind = 'video'"), frame_bytes=256, every_n=2)
        rows = frames.collect()
        assert all(len(r.frame) == 256 for r in rows)
        assert all(r.frame_no % 2 == 0 for r in rows)
        per_media = {}
        for r in rows:
            per_media.setdefault(r.media_id, []).append(r.frame_no)
        assert all(sorted(v) == [0, 2] for v in per_media.values())  # 1024/256=4 frames

class TestCodecFreeDecode:
    def test_wav_roundtrip(self):
        from sketchlib.media import parse_wav, wav_bytes

        samples = (np.sin(np.arange(2000) / 7.0) * 12000).astype(np.int16)
        stereo = np.stack([samples, -samples], axis=1)
        for s, ch in ((samples, 1), (stereo, 2)):
            rate, got_ch, bits, out = parse_wav(wav_bytes(s, 22050))
            assert (rate, got_ch, bits) == (22050, ch, 16)
            assert np.array_equal(out.astype(np.int16), s.reshape(-1, ch))

    def test_bmp_ppm_roundtrip(self):
        from sketchlib.media import bmp_bytes, parse_bmp, parse_ppm, ppm_bytes

        rng = np.random.default_rng(7)
        for w, h in ((13, 9), (16, 4), (1, 1)):  # odd widths exercise row padding
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            assert np.array_equal(parse_bmp(bmp_bytes(px)), px)
            assert np.array_equal(parse_ppm(ppm_bytes(px)), px)

    def test_spark_decode_closed_form(self, spark):
        from sketchlib.media import decode_audio_meta, decode_image_meta, synth_codec_media_df

        m = synth_codec_media_df(spark, 84, partitions=3).cache()
        img = {r.media_id: r for r in decode_image_meta(m).collect()}
        aud = {r.media_id: r for r in decode_audio_meta(m).collect()}
        for i in range(84):
            if i % 7 == 3:
                assert img[i].fmt == "unknown" and not img[i].ok
                assert not aud[i].ok
            elif i % 2 == 0:
                r = img[i]
                assert (r.fmt, r.ok) == ("bmp", True)
                assert (r.width, r.height) == (16 + i % 8, 12 + i % 4)
                assert (r.mean_r, r.mean_g, r.mean_b) == (
                    (i * 3) % 256, (i * 5) % 256, (i * 7) % 256
                )
            else:
                r = aud[i]
                assert r.ok and r.bits == 16 and r.n_channels == 1
                assert r.sample_rate == 8000 + (i % 4) * 4000
                assert r.n_samples == 800 + (i % 10) * 80
                assert r.rms == (i % 100 + 1) * 100  # exact: perfect square
                assert r.duration_s == r.n_samples / r.sample_rate

    def test_spark_resample(self, spark):
        from sketchlib.media import decode_audio_meta, resample_audio, synth_codec_media_df

        m = synth_codec_media_df(spark, 40, partitions=2).filter("kind = 'audio'")
        res = decode_audio_meta(resample_audio(m, 16000).drop("ok"))
        for r in res.collect():
            i = r.media_id
            src_rate = 8000 + (i % 4) * 4000
            src_n = 800 + (i % 10) * 80
            assert r.ok and r.sample_rate == 16000
            assert r.n_samples == round(src_n * 16000 / src_rate)

    def test_resample_passthrough_nonwav(self, spark):
        from sketchlib.media import resample_audio, synth_codec_media_df

        m = synth_codec_media_df(spark, 20, partitions=2).filter("kind = 'garbage'")
        rows = resample_audio(m, 16000).collect()
        assert rows and all(not r.ok for r in rows)


class TestDecontamination:
    def test_planted_overlap(self, spark):
        from sketchlib.textops import decontaminate_ids

        # bench doc shares a 3-gram run with docs 1 and 2; doc 3 disjoint
        shared = "alpha beta gamma delta".split()
        docs = spark.createDataFrame(
            [
                (1, ["x1"] + shared + ["x2"]),
                (2, shared[:3] + ["y1", "y2"]),   # shares "alpha beta gamma"
                (3, [f"z{i}" for i in range(8)]),
                (4, ["alpha", "q1", "beta", "q2", "gamma"]),  # words, no shared 3-gram
            ],
            "doc_id long, words array<string>",
        )
        bench = spark.createDataFrame([(99, shared)], "doc_id long, words array<string>")
        got = {r.doc_id for r in decontaminate_ids(docs, bench, m=1 << 14).collect()}
        assert got == {1, 2}

    def test_short_docs_cannot_contaminate(self, spark):
        from sketchlib.textops import decontaminate_ids

        docs = spark.createDataFrame(
            [(1, ["alpha", "beta"])], "doc_id long, words array<string>"
        )
        bench = spark.createDataFrame(
            [(9, ["alpha", "beta", "gamma"])], "doc_id long, words array<string>"
        )
        assert decontaminate_ids(docs, bench).count() == 0


class TestQualityRules:
    def test_each_rule_discriminates(self, spark):
        from sketchlib.textops import quality_mask, quality_signals

        good = ["the", "words", "flow", "nicely", "and", "carry", "meaning", "here"]
        rows = [
            (1, good),                                  # passes all
            (2, good[:3]),                              # too few words
            (3, ["ab"] * 8),                            # mean word len < 3 (and no stopwords)
            (4, ["the", "a"] + ["123456"] * 6),         # alpha fraction < 80%
            (5, [w for w in good if w not in ("the", "and")] + ["extra", "tail"]),  # <2 stopwords
        ]
        df = spark.createDataFrame(rows, "doc_id long, words array<string>")
        sig = quality_signals(df, "doc_id", "words")
        mask = quality_mask(min_words=5, max_words=100, min_mean_word_len=3,
                            max_mean_word_len=10, min_alpha_frac_pct=80, min_stopwords=2)
        got = {r.doc_id: r.p for r in sig.select("doc_id", mask.alias("p")).collect()}
        assert got == {1: True, 2: False, 3: False, 4: False, 5: False}

    def test_signals_are_integers(self, spark):
        from sketchlib.textops import quality_signals

        df = spark.createDataFrame([(1, ["the", "cat"])], "doc_id long, words array<string>")
        r = quality_signals(df, "doc_id", "words").collect()[0]
        assert (r.n_words, r.word_chars, r.n_alpha_words, r.n_stopwords, r.max_word_len) == (
            2, 6, 2, 1, 3
        )


class TestStratifiedSample:
    def test_deterministic_and_sized(self, spark):
        from sketchlib.textops import stratified_sample

        df = spark.createDataFrame(
            [(i, f"g{i % 4}") for i in range(200)], "doc_id long, grp string"
        )
        a = sorted(map(tuple, stratified_sample(df, ["grp"], "doc_id", 7).collect()))
        b = sorted(map(tuple, stratified_sample(df, ["grp"], "doc_id", 7).collect()))
        assert a == b
        per = {}
        for i, g in a:
            per[g] = per.get(g, 0) + 1
        assert per == {f"g{k}": 7 for k in range(4)}

    def test_small_groups_kept_whole(self, spark):
        from sketchlib.textops import stratified_sample

        df = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, grp string")
        assert stratified_sample(df, ["grp"], "doc_id", 10).count() == 2


class TestScrubPII:
    def test_counts_and_redaction(self, spark):
        from sketchlib.textops import scrub_pii

        rows = [
            (1, "mail me at jane.doe+x@corp.example.org now"),
            (2, "call 555-867-5309 or 111-222-3333"),
            (3, "clean text with no pii at all"),
            (4, "both: a@b.io and 999-888-7777"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in scrub_pii(df, "text").collect()}
        assert (got[1].n_emails, got[1].n_phones) == (1, 0)
        assert (got[2].n_emails, got[2].n_phones) == (0, 2)
        assert (got[3].n_emails, got[3].n_phones) == (0, 0)
        assert (got[4].n_emails, got[4].n_phones) == (1, 1)
        assert "[EMAIL]" in got[1].clean_text and "@" not in got[1].clean_text.replace("[EMAIL]", "")
        assert got[2].clean_text.count("[PHONE]") == 2
        assert got[3].clean_text == rows[2][1]
