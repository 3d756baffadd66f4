"""mm* transforms + training-data pipeline operators."""

from __future__ import annotations

import pyspark.sql.functions as F

from rsyslog_spark import mm
from rsyslog_spark.datapipe import (
    brute_force_topk,
    cosine_lsh_topk,
    decode_media_batch,
    doc_fingerprint,
    embedding_dedup_pairs,
    exact_dedup,
    language_id,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    quality_score,
    simhash_pairs,
    token_count,
)
from rsyslog_spark.datapipe.multimodal import synth_media


# ---------------- mm* ----------------

def test_mmjsonparse(spark):
    df = spark.createDataFrame(
        [('@cee: {"a":"1","b":"x"}',), ("plain text",)], "msg string"
    )
    out = mm.mmjsonparse(df)
    rows = out.orderBy(F.desc("parse_json_success")).collect()
    assert rows[0].cee == {"a": "1", "b": "x"} and rows[0].parse_json_success
    assert rows[1].cee is None and not rows[1].parse_json_success


def test_mmfields(spark):
    df = spark.createDataFrame([("a,b,c",)], "msg string")
    out = mm.mmfields(df, sep=",", max_fields=4).first()
    assert (out.f1, out.f2, out.f3, out.f4) == ("a", "b", "c", None)


def test_mmpstrucdata(spark):
    df = spark.createDataFrame(
        [('[ex@32473 k="87" src="0"]',), ("-",), (None,)],
        "structured_data string",
    )
    rows = mm.mmpstrucdata(df).collect()
    assert rows[0].sd_params == {"k": "87", "src": "0"}
    assert rows[0].sd_id == "ex@32473"
    assert rows[1].sd_params is None and rows[2].sd_params is None


def test_mmanon(spark):
    df = spark.createDataFrame(
        [("src 192.168.17.42 dst 10.0.0.7 done",)], "msg string"
    )
    got = mm.mmanon(df, ["msg"], bits=16).first().msg
    assert got == "src 192.168.0.0 dst 10.0.0.0 done"
    got8 = mm.mmanon(df, ["msg"], bits=8).first().msg
    assert got8 == "src 192.168.17.0 dst 10.0.0.0 done"
    ip = mm.mmanon_ip(F.lit("192.168.17.42"), bits=12)
    one = spark.range(1)
    assert one.select(ip.alias("r")).first().r == "192.168.16.0"


def test_mmrm1stspace_and_utf8fix(spark):
    df = spark.createDataFrame([(" leading",), ("none",)], "msg string")
    got = [r.msg for r in mm.mmrm1stspace(df).collect()]
    assert got == ["leading", "none"]
    df2 = spark.createDataFrame([("bad\x01char",)], "msg string")
    assert mm.mmutf8fix(df2).first().msg == "bad char"


def test_mmnormalize(spark):
    rules = [
        mm.NormalizeRule("connection from %ip:ipv4% port %port:number%"),
        mm.NormalizeRule("user %user:word% logged %action:rest%"),
    ]
    df = spark.createDataFrame(
        [
            ("connection from 10.1.2.3 port 22",),
            ("user alice logged in from console",),
            ("something else entirely",),
        ],
        "msg string",
    )
    rows = mm.mmnormalize(df, rules).collect()
    assert rows[0].norm == {"ip": "10.1.2.3", "port": "22"} and rows[0].norm_rule == 0
    assert rows[1].norm == {"user": "alice", "action": "in from console"}
    assert rows[1].norm_rule == 1
    assert rows[2].norm is None and rows[2].norm_rule == -1


RULEBASE = r"""# sample v1 rulebase (shape of tests/testsuites/mmnormalize_*.rulebase)
version=1
rule=WIN,prod:<%n1:number%>1 %-:date-rfc5424% %host:word% %v_tag:word% %v_msg:rest%
annotate=WIN:+v_prefix="EvntSLog: "
annotate=prod:+env="production"
rule=ESX:<%-:number%>%ts:date-rfc3164% %host:word% %v_tag:char-to:\x3a%: %v_msg:rest%
rule=IPS:local ips are %ips:tokenized:, :ipv4%
rule=RX:host ports are %hps:regex:([0-9.\x3a]+(, )?)+% etc
"""


def test_load_rulebase_and_normalize(spark):
    rules = mm.load_rulebase(RULEBASE)
    assert [r.tags for r in rules] == [["WIN", "prod"], ["ESX"], ["IPS"], ["RX"]]
    assert rules[0].const_fields == {
        "v_prefix": "EvntSLog: ", "env": "production"
    }
    df = spark.createDataFrame(
        [
            ("<107>1 2024-01-01T00:09:58Z host13 error msgnum:00000000",),
            ("<13>Jan  5 10:11:12 web01 sshd[17]: accepted",),
            ("local ips are 10.0.0.1, 10.0.0.2, 192.168.1.9",),
            ("host ports are 10.0.0.1:443, 10.0.0.2:80 etc",),
            ("nothing matches this",),
        ],
        "msg string",
    )
    rows = mm.mmnormalize(df, rules).collect()
    assert rows[0].norm_rule == 0
    assert rows[0].norm["n1"] == "107" and rows[0].norm["host"] == "host13"
    assert rows[0].norm["v_prefix"] == "EvntSLog: "  # annotation applied
    assert rows[0].norm["env"] == "production"
    assert "ts" not in rows[0].norm  # %-:date-rfc5424% discarded
    assert rows[1].norm_rule == 1
    assert rows[1].norm["v_tag"] == "sshd[17]"
    assert rows[1].norm["ts"] == "Jan  5 10:11:12"
    assert rows[2].norm["ips"] == "10.0.0.1, 10.0.0.2, 192.168.1.9"
    assert rows[3].norm["hps"] == "10.0.0.1:443, 10.0.0.2:80"
    assert rows[4].norm_rule == -1 and rows[4].norm is None


def test_load_rulebase_rejects_unsupported_v2_shapes():
    import pytest

    # repeat without a parser list
    with pytest.raises(ValueError, match="parser"):
        mm.load_rulebase('rule=:msg: %{"name":"n", "type":"repeat"}% b')
    # r5: nesting is now arbitrary-depth, but a nested repeat whose
    # separator could collide with an enclosing one is still rejected
    with pytest.raises(ValueError, match="collide"):
        mm.load_rulebase(
            'rule=:%{"name":"n","type":"repeat","parser":'
            '{"name":"i","type":"repeat","parser":{"type":"number"},'
            '"while":{"type":"literal","text":","}},'
            '"while":{"type":"literal","text":","}}%'
        )
    # substring separators corrupt the outer split just like equal
    # ones (code-review r4): ';' vs '; '
    with pytest.raises(ValueError, match="substring"):
        mm.load_rulebase(
            'rule=:%{"name":"n","type":"repeat","parser":'
            '{"name":"i","type":"repeat","parser":{"type":"number"},'
            '"while":{"type":"literal","text":"; "}},'
            '"while":{"type":"literal","text":";"}}%'
        )
    # ...as is a non-literal separator matching an enclosing literal
    with pytest.raises(ValueError, match="collide"):
        mm.load_rulebase(
            'rule=:%{"name":"n","type":"repeat","parser":'
            '{"name":"i","type":"repeat","parser":{"type":"number"},'
            '"while":{"type":"whitespace"}},'
            '"while":{"type":"literal","text":" "}}%'
        )
    # two non-literal separators can overlap even when the patterns
    # differ (alpha vs word) — rejected (code-review r5)
    with pytest.raises(ValueError, match="non-literal"):
        mm.load_rulebase(
            'rule=:%{"name":"n","type":"repeat","parser":'
            '{"name":"i","type":"repeat","parser":{"type":"number"},'
            '"while":{"type":"char-to","extradata":","}},'
            '"while":{"type":"whitespace"}}%'
        )
    # a repeat branch sharing its name with another alternative branch
    # would LAST_WIN-collide in the output map — rejected loudly
    with pytest.raises(ValueError, match="share its name"):
        mm.load_rulebase(
            'rule=:%{"type":"alternative","parser":['
            '{"name":"x","type":"repeat","parser":{"type":"number"},'
            '"while":{"type":"literal","text":","}},'
            '{"name":"x","type":"alpha"}]}%'
        )
    # while must be a parser OBJECT
    with pytest.raises(ValueError, match="while"):
        mm.load_rulebase(
            'rule=:%{"name":"n","type":"repeat",'
            '"parser":{"type":"number"},"while":","}%'
        )


def test_v2_deep_nesting_and_regex_while(spark):
    """r5: arbitrary nesting depth (repeat>repeat>repeat, alternative
    at any level) and non-literal `while` parsers (liblognorm runs the
    while PARSER between iterations — any supported atom type)."""
    import json

    r = mm.NormalizeRule(
        'groups %{"name":"g","type":"repeat","parser":['
        '{"type":"repeat","name":"pairs","parser":['
        '{"type":"repeat","name":"ids","parser":'
        '[{"name":"n","type":"number"}],'
        '"while":{"type":"literal","text":"+"}}],'
        '"while":{"type":"literal","text":","}}],'
        '"while":{"type":"literal","text":" | "}}%'
    )
    df = spark.createDataFrame([("groups 1+2,3 | 4+5+6",)], "msg string")
    out = json.loads(
        mm.mmnormalize(df, [r]).select(F.col("norm")["g"]).first()[0]
    )
    assert out == [
        {"pairs": [{"ids": [{"n": "1"}, {"n": "2"}]},
                   {"ids": [{"n": "3"}]}]},
        {"pairs": [{"ids": [{"n": "4"}, {"n": "5"}, {"n": "6"}]}]},
    ]
    # whitespace (non-literal) separator
    r2 = mm.NormalizeRule(
        'vals %{"name":"v","type":"repeat",'
        '"parser":[{"name":"n","type":"number"}],'
        '"while":{"type":"whitespace"}}%'
    )
    df2 = spark.createDataFrame([("vals 10 20   30",)], "msg string")
    out2 = json.loads(
        mm.mmnormalize(df2, [r2]).select(F.col("norm")["v"]).first()[0]
    )
    assert out2 == [{"n": "10"}, {"n": "20"}, {"n": "30"}]
    # alternative nested inside a depth-2 repeat: non-participating
    # branch omitted per element
    r3 = mm.NormalizeRule(
        'x %{"name":"o","type":"repeat","parser":['
        '{"type":"repeat","name":"e","parser":['
        '{"type":"alternative","parser":['
        '{"name":"num","type":"number"},{"name":"w","type":"word"}]}],'
        '"while":{"type":"literal","text":"+"}}],'
        '"while":{"type":"literal","text":";"}}%'
    )
    df3 = spark.createDataFrame([("x 1+abc;2",)], "msg string")
    out3 = json.loads(
        mm.mmnormalize(df3, [r3]).select(F.col("norm")["o"]).first()[0]
    )
    assert out3 == [{"e": [{"num": "1"}, {"w": "abc"}]},
                    {"e": [{"num": "2"}]}]

def test_v2_repeat_and_alternative(spark):
    """liblognorm v2 subset (VERDICT r2 next #3): repeat emits the JSON
    array liblognorm would (objects when the inner parsers are named),
    alternative emits only the branch that participated; v1 and v2
    placeholders mix in one rule (v2 syntax doc; plugins/mmnormalize)."""
    rb = """version=2
rule=users:users: %{"name":"users", "type":"repeat", "parser":{"type":"word","name":"user"}, "while":{"type":"literal","text":", "}}%
rule=:pauses %{"name":"p", "type":"repeat", "parser":{"type":"number"}, "while":{"type":"literal","text":","}}% end
rule=:val=%{"type":"alternative", "parser":[{"type":"number","name":"n"},{"type":"word","name":"w"}]}% done
rule=:x=%{"type":"alternative", "parser":[{"type":"number","name":"v"},{"type":"alpha","name":"v"}]}%
rule=:%host:word% kv %{"name":"kv","type":"repeat","parser":[{"type":"word","name":"k"},{"type":"literal","text":"="},{"type":"number","name":"v"}],"while":{"type":"literal","text":";"}}%
"""
    rules = mm.load_rulebase(rb)
    df = spark.createDataFrame(
        [
            ("users: john, paul, george",),
            ("pauses 10,20,30 end",),
            ("val=42 done",),
            ("val=apple done",),
            ("x=99",),
            ("x=abc",),
            ("web01 kv a=1;b=22",),
            ("nomatch",),
        ],
        "msg string",
    )
    rows = mm.mmnormalize(df, rules).collect()
    assert rows[0].norm == {
        "users": '[{"user":"john"},{"user":"paul"},{"user":"george"}]'
    }
    assert rows[1].norm == {"p": '["10","20","30"]'}
    assert rows[2].norm == {"n": "42"}        # only the matched branch
    assert rows[3].norm == {"w": "apple"}
    assert rows[4].norm == {"v": "99"}        # same-name branches merge
    assert rows[5].norm == {"v": "abc"}
    assert rows[6].norm == {
        "host": "web01", "kv": '[{"k":"a","v":"1"},{"k":"b","v":"22"}]'
    }
    assert rows[7].norm_rule == -1 and rows[7].norm is None


def test_v2_nested_repeat_alternative(spark):
    """r4 (VERDICT r3 missing #3): one level of composite nesting —
    an alternative INSIDE a repeat element (per-element branch pick),
    a repeat INSIDE a repeat (nested JSON array; separators must
    differ), and a repeat as an alternative BRANCH (array emitted only
    when that branch participated)."""
    rb = """version=2
rule=:alt %{"name":"xs","type":"repeat","parser":[{"type":"literal","text":"<"},{"type":"alternative","parser":[{"type":"number","name":"v"},{"type":"alpha","name":"v"}]},{"type":"literal","text":">"}],"while":{"type":"literal","text":","}}%
rule=:mat %{"name":"rows","type":"repeat","parser":{"name":"cells","type":"repeat","parser":{"type":"number"},"while":{"type":"literal","text":","}},"while":{"type":"literal","text":";"}}%
rule=:pick %{"type":"alternative","parser":[{"name":"nums","type":"repeat","parser":{"type":"number"},"while":{"type":"literal","text":","}},{"type":"alpha","name":"word"}]}% end
rule=:mix %{"name":"ys","type":"repeat","parser":[{"type":"alternative","parser":[{"type":"number","name":"num"},{"type":"alpha","name":"word"}]}],"while":{"type":"literal","text":","}}%
"""
    rules = mm.load_rulebase(rb)
    df = spark.createDataFrame(
        [
            ("alt <1>,<a>,<22>",),
            ("mat 1,2;3,4;5,6",),
            ("pick 7,8,9 end",),
            ("pick hello end",),
            ("mix 1,a,22",),
        ],
        "msg string",
    )
    rows = mm.mmnormalize(df, rules).collect()
    # alternative inside repeat: each element emits the branch that hit
    assert rows[0].norm == {
        "xs": '[{"v":"1"},{"v":"a"},{"v":"22"}]'
    }
    # repeat inside repeat: nested arrays
    assert rows[1].norm == {
        "rows": '[{"cells":["1","2"]},{"cells":["3","4"]},'
                '{"cells":["5","6"]}]'
    }
    # repeat as an alternative branch: array when it matched, absent
    # when the other branch did
    assert rows[2].norm == {"nums": '["7","8","9"]'}
    assert rows[3].norm == {"word": "hello"}
    # differently-named branches inside a repeat element: only the
    # participating branch's field appears (code-review r4 #4)
    assert rows[4].norm == {
        "ys": '[{"num":"1"},{"word":"a"},{"num":"22"}]'
    }


def test_lognorm_extended_types(spark):
    rules = [
        mm.NormalizeRule("v6 %addr:ipv6% end"),
        mm.NormalizeRule("js %payload:json% tail"),
        mm.NormalizeRule("f %x:float% h %y:hexnumber%"),
    ]
    df = spark.createDataFrame(
        [
            ("v6 2001:db8::8a2e:370:7334 end",),
            ('js {"a": {"b": 1}} tail',),
            ("f -3.25 h 0xDEAD",),
        ],
        "msg string",
    )
    rows = mm.mmnormalize(df, rules).collect()
    assert rows[0].norm == {"addr": "2001:db8::8a2e:370:7334"}
    assert rows[1].norm == {"payload": '{"a": {"b": 1}}'}
    assert rows[2].norm == {"x": "-3.25", "y": "0xDEAD"}


def test_mmgrok(spark):
    df = spark.createDataFrame(
        [
            ("Accepted password for root from 192.168.1.50 port 2244",),
            ("ERROR took 12.5 ms on host web-01.example.com",),
            ("no structure here",),
        ],
        "msg string",
    )
    out = mm.mmgrok(
        df, r"from %{IPV4:src_ip} port %{POSINT:port}"
    ).collect()
    assert out[0].grok["src_ip"] == "192.168.1.50" and out[0].grok["port"] == "2244"
    assert not out[2].grok_success

    lvl = mm.mmgrok(
        df, r"%{LOGLEVEL:level} took %{NUMBER:ms} ms on host %{HOSTNAME:host}"
    ).collect()
    assert lvl[1].grok == {
        "level": "ERROR", "ms": "12.5", "host": "web-01.example.com"
    }
    # three-part %{SYNTAX:name:type} keeps the name, drops the type
    typed = mm.mmgrok(df, r"port %{POSINT:port:int}").collect()
    assert typed[0].grok["port"] == "2244"


def test_mmgrok_unknown_pattern():
    import pytest

    with pytest.raises(ValueError, match="unknown grok"):
        mm.GrokRule("%{NOSUCHPATTERN:x}")


# ---------------- datapipe: dedup ----------------

def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup
        (4, "completely different text about spark engines and shuffles"),
        (5, "THE QUICK  BROWN fox jumps over the lazy dog"),  # norm dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    out = exact_dedup(_docs(spark)).collect()
    assert len(out) == 1
    assert out[0].n_dups == 3 and out[0].keep_id == 1
    assert out[0].dup_ids == [1, 2, 5]


def test_minhash_lsh_pairs(spark):
    pairs = minhash_lsh_pairs(
        _docs(spark), num_hashes=32, bands=16, shingle_k=2, threshold=0.5
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got and (1, 5) in got and (2, 5) in got
    assert (1, 3) in got  # near dup shares most shingles
    assert not any(4 in p for p in got)


def test_ngram_jaccard_pairs(spark):
    pairs = ngram_jaccard_pairs(_docs(spark), shingle_k=2, threshold=0.5)
    rows = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert rows[(1, 2)] == 1.0
    assert 0.5 <= rows[(1, 3)] < 1.0
    assert not any(4 in k for k in rows)


def test_simhash_pairs(spark):
    pairs = simhash_pairs(_docs(spark), max_hamming=6)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got and (1, 5) in got


def test_simhash_pairs_full_recall_within_hamming(spark):
    # multi-table pigeonhole blocking must find EVERY pair within the
    # hamming budget — compare against the exhaustive cross join
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta token{i % 4} "
             f"eta theta iota kappa word{i % 3}") for i in range(30)],
        "doc_id long, text string",
    )
    from rsyslog_spark.datapipe.dedup import simhash, word_hashes

    sh = docs.select(
        F.col("doc_id").alias("id"),
        simhash(word_hashes(F.col("text")), 64).alias("sh"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    exact = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("h"),
        )
        .filter(F.col("h") <= 3)
        .collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in simhash_pairs(docs, max_hamming=3, bucket_cap=None).collect()
    }
    assert got == exact and len(exact) > 0


def _mass_dup_docs(spark, n=400):
    # adversarial fixture: one mass-duplicate cluster + a tail of
    # distinct docs. Uncapped LSH would make ~n²/2 candidates.
    rows = [(i, "identical replicated payload common tokens here") for i in range(n)]
    rows += [(n + i, f"unique document number {i} with words w{i} v{i} u{i}")
             for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_bucket_cap_bounds_candidates(spark):
    docs = _mass_dup_docs(spark)
    capped = minhash_lsh_pairs(docs, num_hashes=32, bands=8, shingle_k=2,
                               threshold=0.5, bucket_cap=50)
    # the 400-doc identical cluster is dropped from LSH (exact_dedup
    # territory); candidate pairs stay bounded by cap² per bucket
    assert capped.count() <= 50 * 50
    # normal corpus unaffected by the default cap
    normal = minhash_lsh_pairs(
        _docs(spark), num_hashes=32, bands=16, shingle_k=2, threshold=0.5
    )
    got = {(r.id_a, r.id_b) for r in normal.collect()}
    assert (1, 2) in got and (1, 5) in got


def test_ngram_jaccard_df_cap_bounds_candidates(spark):
    docs = _mass_dup_docs(spark)
    # every shingle of the mass cluster has df≈400 > df_max → no
    # candidates from it; distinct tail docs share no rare shingle
    out = ngram_jaccard_pairs(docs, shingle_k=2, threshold=0.5, df_max=100)
    assert all(r.id_a >= 400 or r.id_b >= 400 for r in out.collect()) or out.count() == 0
    # exactness preserved on the normal corpus (df cap not binding)
    pairs = ngram_jaccard_pairs(_docs(spark), shingle_k=2, threshold=0.5)
    rows = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert rows[(1, 2)] == 1.0 and 0.5 <= rows[(1, 3)] < 1.0


# ---------------- datapipe: simsearch ----------------

def _vectors(spark):
    import math

    rows = []
    for i in range(50):
        angle = (i % 10) * math.pi / 20
        rows.append((i, [math.cos(angle), math.sin(angle)] + [0.0] * 6))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk(spark):
    corpus = _vectors(spark)
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0] + [0.0] * 6)], "q_id long, q_vec array<float>"
    )
    out = brute_force_topk(corpus, queries, k=5).collect()
    assert len(out) == 5
    # best matches are the angle-0 vectors (ids ≡ 0 mod 10)
    assert out[0].vec_id % 10 == 0 and abs(out[0].score - 1.0) < 1e-6
    assert all(out[i].score >= out[i + 1].score for i in range(4))


def test_cosine_lsh_topk_approximates(spark):
    corpus = _vectors(spark)
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0] + [0.0] * 6)], "q_id long, q_vec array<float>"
    )
    exact = {r.vec_id for r in brute_force_topk(corpus, queries, k=5).collect()}
    approx = {
        r.vec_id
        for r in cosine_lsh_topk(corpus, queries, k=5, n_planes=6, dim=8).collect()
    }
    assert len(exact & approx) >= 3  # decent recall on this easy set


def test_embedding_dedup_pairs_finds_near_dups(spark):
    import math

    # two tight clusters (near-dups within, far across) + loners
    rows = []
    for i in range(4):
        eps = i * 1e-3
        rows.append((i, [1.0, eps] + [0.0] * 6))
        rows.append((10 + i, [eps, 1.0] + [0.0] * 6))
    rows.append((99, [math.sqrt(0.5), math.sqrt(0.5)] + [0.0] * 6))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.id_a, r.id_b)
        for r in embedding_dedup_pairs(
            corpus, threshold=0.999, n_planes=6, dim=8
        ).collect()
    }
    assert got  # within-cluster pairs found
    # no cross-cluster or loner pairs (cos ≤ ~0.71 < 0.999)
    assert all((a < 10) == (b < 10) and a != 99 and b != 99 for a, b in got)


def test_semdedup_keeps_farthest_from_centroid(spark):
    """SemDeDup keep rule: within a duplicate group the survivor is
    the member with LOWEST centroid cosine (farthest first in the
    scan order); non-dup items all stay; clusters are independent."""
    from rsyslog_spark.datapipe.simsearch import semdedup

    # cluster 0 (axis 0): a dup pair at perturbation 0.3 (ids 1, 2 —
    # cosine 1.0) plus a distinct loner at the centroid (id 0);
    # cluster 1 (axis 1): singletons only
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.3, 0.0]),
        (2, [1.0, 0.0, 0.3, 0.0]),
        (10, [0.0, 1.0, 0.0, 0.0]),
        (11, [0.0, 1.0, 0.0, 0.9]),
    ]
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    out = {
        r.id: r
        for r in semdedup(
            spark.createDataFrame(
                rows, "vec_id long, embedding array<float>"
            ),
            centroids=cents, threshold=0.99,
        ).collect()
    }
    assert [out[i].cluster for i in (0, 1, 2)] == [0, 0, 0]
    assert [out[i].cluster for i in (10, 11)] == [1, 1]
    # dup group {1,2}: same cent_cos -> id tie-break keeps 1, drops 2
    assert out[1].keep and not out[2].keep
    assert out[0].keep and out[10].keep and out[11].keep
    assert not any(r.capped for r in out.values())


def test_semdedup_cluster_cap_flags_not_prunes(spark):
    """An over-full cluster is returned keep=true/capped=true — the
    m² pairwise is skipped, nothing is silently dropped."""
    from rsyslog_spark.datapipe.simsearch import semdedup

    rows = [(i, [1.0, float(i % 3) * 0.3, 0.0, 0.0]) for i in range(40)]
    rows += [(100, [0.0, 0.0, 0.0, 1.0]), (101, [0.0, 0.0, 0.0, 1.0])]
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
    out = {
        r.id: r
        for r in semdedup(
            spark.createDataFrame(
                rows, "vec_id long, embedding array<float>"
            ),
            centroids=cents, threshold=0.99, cluster_cap=10,
        ).collect()
    }
    assert all(out[i].capped and out[i].keep for i in range(40))
    # the small cluster still dedups normally
    assert out[100].keep and not out[101].keep
    assert not out[100].capped

    import pytest

    with pytest.raises(ValueError, match="threshold"):
        semdedup(
            spark.createDataFrame(
                rows, "vec_id long, embedding array<float>"
            ),
            centroids=cents, threshold=0.0,
        )


def test_embedding_dedup_bucket_cap_bounds_candidates(spark):
    # adversarial: one mass-duplicate vector cluster (all land in ONE
    # LSH bucket → uncapped would be n²/2 candidates) + a distinct tail
    rows = [(i, [1.0, 0.5, 0.25] + [0.0] * 5) for i in range(400)]
    for i in range(6):
        eps = i * 1e-3
        rows.append((1000 + i, [eps, -1.0] + [0.0] * 6))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    capped = embedding_dedup_pairs(
        corpus, threshold=0.99, n_planes=6, dim=8, bucket_cap=50
    )
    out = {(r.id_a, r.id_b) for r in capped.collect()}
    # the 400-dup cluster is dropped (exact_dedup territory); candidates
    # stay bounded by cap² per bucket
    assert len(out) <= 50 * 50
    assert all(a >= 1000 for a, _ in out)
    # the small tail cluster is still fully recovered
    assert (1000, 1001) in out


# ---------------- datapipe: text stats ----------------

def test_token_count_and_fingerprint(spark):
    df = spark.createDataFrame(
        [("one two  three",), ("",), ("single",)], "text string"
    )
    got = [r.n for r in df.select(token_count(F.col("text")).alias("n")).collect()]
    assert got == [3, 0, 1]
    fps = df.select(doc_fingerprint(F.col("text")).alias("fp")).collect()
    assert len({r.fp for r in fps}) == 3


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is in that house",),
            ("el que la de los y un en",),
            ("zzz qqq xxx",),
        ],
        "text string",
    )
    got = [r.lang_pred for r in language_id(df).collect()]
    assert got == ["en", "es", "und"]


def test_quality_score(spark):
    df = spark.createDataFrame(
        [
            ("The quick brown fox jumps over the lazy dog near the river bank "
             "while the sun sets over distant hills in the evening light",),
            ("!!! ??? ### $$$ %%%",),
        ],
        "text string",
    )
    rows = quality_score(df).collect()
    assert rows[0].quality > 0.7 > rows[1].quality


# ---------------- datapipe: multimodal ----------------

def test_decode_media_batch(spark):
    media = synth_media(spark, 16)
    out = decode_media_batch(media, n_features=4).collect()
    ok = [r for r in out if r.decode_ok.startswith("ok")]
    bad = [r for r in out if not r.decode_ok.startswith("ok")]
    assert len(ok) == 12 and len(bad) == 4  # hologram modality unstubbed
    assert all(len(r.features) == 4 for r in ok)
    assert all(r.features is None for r in bad)
    # deterministic: same payload → same features
    again = decode_media_batch(synth_media(spark, 16), n_features=4).collect()
    assert {r.media_id: tuple(r.features or ()) for r in out} == {
        r.media_id: tuple(r.features or ()) for r in again
    }


def test_ivf_topk_approximates(spark):
    corpus = _vectors(spark)
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0] + [0.0] * 6)], "q_id long, q_vec array<float>"
    )
    from rsyslog_spark.datapipe.simsearch import (
        ivf_assign,
        ivf_topk,
        ivf_train_centroids,
    )

    exact = {r.vec_id for r in brute_force_topk(corpus, queries, k=5).collect()}
    approx = {
        r.vec_id
        for r in ivf_topk(
            corpus, queries, k=5, n_centroids=5, n_probe=3
        ).collect()
    }
    assert len(exact & approx) >= 3  # decent recall on this easy set
    # codebook reuse path: pretrained centroids skip training
    cb = ivf_train_centroids(corpus, n_centroids=5)
    assigned = ivf_assign(corpus, cb)
    assert assigned.select("cluster").distinct().count() <= 5
    again = {
        r.vec_id
        for r in ivf_topk(
            corpus, queries, k=5, n_probe=3, centroids=cb
        ).collect()
    }
    assert len(exact & again) >= 3


def test_frame_sample_and_resize(spark):
    from rsyslog_spark.datapipe.multimodal import (
        frame_sample,
        resize_images,
        synth_media,
    )

    media = synth_media(spark, 16)  # 4 of each modality
    frames = frame_sample(media, n_frames=4)
    rows = frames.collect()
    assert len(rows) == 16  # 4 videos × 4 frames
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    for mid, fs in by_id.items():
        assert [f.frame_idx for f in sorted(fs, key=lambda x: x.frame_idx)] == [0, 1, 2, 3]
        assert all(f.ts_ms < 1000 for f in fs)  # uniform over duration
    # deterministic
    again = frame_sample(synth_media(spark, 16), n_frames=4).collect()
    assert {(r.media_id, r.frame_idx): bytes(r.frame_payload) for r in rows} \
        == {(r.media_id, r.frame_idx): bytes(r.frame_payload) for r in again}

    resized = resize_images(media, 32, 32).collect()
    assert len(resized) == 4  # images only
    assert all(len(r.payload) == 32 * 32 // 64 for r in resized)
    assert all(r.width == 32 and r.height == 32 for r in resized)


def test_load_grok_patterns(spark):
    pats = mm.load_grok_patterns(
        "# custom app patterns\n"
        "APPID app-%{NONNEGINT}\n"
        "REQLINE %{WORD} %{NOTSPACE} HTTP/%{NUMBER}\n"
    )
    df = spark.createDataFrame(
        [("app-42 GET /x/y HTTP/1.1 from 10.0.0.1",)], "msg string"
    )
    out = mm.mmgrok(
        df, r"%{APPID:app} %{REQLINE:req} from %{IPV4:ip}",
        extra_patterns=pats,
    ).first()
    assert out.grok == {
        "app": "app-42", "req": "GET /x/y HTTP/1.1", "ip": "10.0.0.1"
    }


def test_grok_user_parens_and_nested_captures(spark):
    df = spark.createDataFrame(
        [("42 alpha done",)], "msg string"
    )
    # literal user group must not shift the %{WORD:w} capture
    out = mm.mmgrok(df, r"(\d+) %{WORD:w}").first()
    assert out.grok == {"w": "alpha"}
    # nested %{X:name} refs inside a loaded pattern still emit fields,
    # in group-number order (outer before inner)
    pats = mm.load_grok_patterns("PAIR %{NONNEGINT:num} %{WORD:word}\n")
    out2 = mm.mmgrok(df, r"%{PAIR:pair} done", extra_patterns=pats).first()
    assert out2.grok == {"pair": "42 alpha", "num": "42", "word": "alpha"}
    # named groups in user patterns are neutralized too
    pats2 = mm.load_grok_patterns("NG (?<x>[a-z]+)\n")
    out3 = mm.mmgrok(df, r"%{NONNEGINT:n} %{NG:g}", extra_patterns=pats2).first()
    assert out3.grok == {"n": "42", "g": "alpha"}


def test_noncapture_escaped_backslash_runs():
    """ADVICE r2 (mm.py _noncapture): in ``\\\\(x)`` the paren follows
    a LITERAL backslash (even-length escape run) and IS a capturing
    group — it must be neutralized; ``\\(`` (odd run) is a literal
    paren and must survive. Parens inside character classes are
    literals too."""
    nc = mm._noncapture
    assert nc(r"\\(x)") == r"\\(?:x)"       # escaped backslash + group
    assert nc(r"\(x\)") == r"\(x\)"         # literal parens untouched
    assert nc(r"\\\(x") == r"\\\(x"         # \\ then \( — all literal
    assert nc(r"[(]a(b)") == r"[(]a(?:b)"   # class paren is literal
    assert nc(r"(?<=a)(?<n>b)(c)") == r"(?<=a)(?:b)(?:c)"


def test_mmexternal_real_child_process(spark):
    """mmexternal against a REAL external program: one child per
    partition, line-in/JSON-line-out protocol (mmexternal.c)."""
    import json
    import sys

    from rsyslog_spark.datapipe.multimodal import mmexternal

    child = [
        sys.executable, "-u", "-c",
        ("import sys,json\n"
         "for line in sys.stdin:\n"
         "    m=line.rstrip('\\n')\n"
         "    print(json.dumps({'up': m.upper(), 'len': len(m)}))\n"),
    ]
    df = spark.createDataFrame(
        [("hello",), ("World",), ("",)], "msg string"
    ).repartition(2)
    rows = {r.msg: json.loads(r.external)
            for r in mmexternal(df, child).collect()}
    assert rows["hello"] == {"up": "HELLO", "len": 5}
    assert rows["World"] == {"up": "WORLD", "len": 5}
    assert rows[""] == {"up": "", "len": 0}


def test_mmjsontransform(spark):
    """plugins/mmjsontransform: unflatten (dotted → nested containers)
    and flatten (nested → dotted map), mmjsontransform.c:64,552."""
    import json

    import pytest

    df = spark.createDataFrame(
        [('{"a":{"b":1,"c":{"d":"x"}},"e":2}',), (None,)], "j string"
    )
    flat = mm.mmjsontransform(df, "j", "flat", mode="flatten").collect()
    assert dict(flat[0].flat) == {"a.b": "1", "a.c.d": "x", "e": "2"}
    assert flat[1].flat is None
    df2 = spark.createDataFrame([('{"a.b":"1","a.c":"2","e":"3"}',)],
                                "j string")
    nested = mm.mmjsontransform(df2, "j", "nested").first().nested
    assert json.loads(nested) == {"a": {"b": "1", "c": "2"}, "e": "3"}
    with pytest.raises(ValueError, match="invalid"):
        mm.mmjsontransform(df, "j", "x", mode="bogus")


def test_log_templates(spark):
    """Drain-style template mining: IP/hex/digit masking collapses
    messages to their shapes; masking order keeps 0x3E7 whole."""
    from rsyslog_spark.datapipe.textstats import log_templates

    df = spark.createDataFrame(
        [
            ("conn from 10.0.0.1 port 443",),
            ("conn from 192.168.7.9 port 80",),
            ("logon id 0x3E7 ok",),
            ("logon id 0xA1 ok",),
            ("heartbeat",),
        ],
        "msg string",
    )
    got = {r.template: r.n for r in log_templates(df).collect()}
    assert got == {
        "conn from <IP> port <N>": 2,
        "logon id <X> ok": 2,
        "heartbeat": 1,
    }


def test_repetition_stats(spark):
    """Gopher repetition rules: duplicate-line and duplicate-word
    fractions in permille; empty text degrades to zero."""
    from rsyslog_spark.datapipe.textstats import repetition_stats

    rows = repetition_stats(spark.createDataFrame(
        [
            ("a\nb\na\nb",),        # 4 lines, 2 distinct -> 500
            ("spam spam spam ok",),  # 4 words, 2 distinct -> 500
            ("all unique lines\nhere",),
            ("",),
        ],
        "text string",
    )).collect()
    assert rows[0].n_lines == 4 and rows[0].dup_line_permille == 500
    assert rows[1].dup_word_permille == 500
    assert rows[2].dup_line_permille == 0
    assert rows[3].dup_word_permille == 0


def test_ngram_repetition_stats(spark):
    """Gopher top-/dup-n-gram character fractions: hand-computed
    values, tie-break (max count, then max length, then first in
    sorted order), overlap double-count artifact (>1000 possible for
    top-grams of self-overlapping text — inherent to the count x
    length definition), empty text -> all zero, and a zero-Exchange
    plan (per-doc folds need no shuffle)."""
    from rsyslog_spark.datapipe.textstats import ngram_repetition_stats

    out = ngram_repetition_stats(spark.createDataFrame(
        [
            (1, "a b a b a b"),
            (2, "x y z w v"),
            (3, ""),
            (4, "the quick brown fox jumps the quick brown fox"
                " jumps tail0 tail1"),
        ],
        "id long, text string",
    ))
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p
    rows = {r.id: r for r in out.collect()}
    # doc1 total chars = 11; top bigram 'a b' x3 (9 chars) -> 818;
    # top trigram tie 'a b a'/'b a b' both x2 len 5 -> first sorted
    # -> 909; top 4-gram 'a b a b' x2 len 7 = 14 chars -> 1272 (>1000
    # via overlapping occurrences); no duplicate 5-grams.
    assert rows[1].top_2gram_permille == 818
    assert rows[1].top_3gram_permille == 909
    assert rows[1].top_4gram_permille == 1272
    assert rows[1].dup_5gram_permille == 0
    # doc2: all unique; top bigram = any len-3 gram once -> 333
    assert rows[2].top_2gram_permille == 333
    assert rows[2].dup_5gram_permille == 0
    assert all(
        v == 0 for k, v in rows[3].asDict().items() if "permille" in k
    )
    # doc4 total = 63; count-tie at 2 -> longest wins: 'quick brown'
    # (11 chars) x2 = 22 -> 349; dup 5-gram = the repeated phrase
    # (25 chars) x2 = 50 -> 793
    assert rows[4].top_2gram_permille == 22 * 1000 // 63
    assert rows[4].dup_5gram_permille == 50 * 1000 // 63
    assert rows[4].dup_6gram_permille == 0


def test_pii_scrub(spark):
    """PII masking order: SSN/card masked before the greedy phone
    pattern can swallow their digit runs; dots keep IPs out of the
    phone class; clean text passes through untouched."""
    from rsyslog_spark.datapipe.textstats import pii_scrub

    rows = pii_scrub(spark.createDataFrame(
        [
            ("mail bob.smith+x@corp.example.org now",),
            ("from 192.168.1.200 port 443",),
            ("ssn 123-45-6789 card 4111111111111111",),
            ("call +1 (555) 123-4567 today",),
            ("no pii here",),
        ],
        "text string",
    )).collect()
    got = [r.scrubbed for r in rows]
    assert got[0] == "mail <EMAIL> now"
    assert got[1] == "from <IP> port 443"
    assert got[2] == "ssn <SSN> card <CARD>"
    assert got[3] == "call <PHONE> today"
    assert got[4] == "no pii here" and not rows[4].pii_found
    assert all(r.pii_found for r in rows[:4])


def test_dedup_clusters(spark):
    """Transitive pair clustering: a chain and a star collapse to
    min-id components; disjoint pairs stay separate; fixpoint reached
    well under the iteration cap."""
    from rsyslog_spark.datapipe.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [
            (5, 9), (9, 2), (2, 7),   # chain -> comp 2
            (10, 11), (10, 12), (10, 13),  # star -> comp 10
            (20, 21),                  # pair  -> comp 20
        ],
        "id_a long, id_b long",
    )
    got = {r.id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert got == {
        5: 2, 9: 2, 2: 2, 7: 2,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
    }
    # non-convergence must RAISE, not silently split a component
    # (code-review r4b): a 12-node chain cannot converge in 3 rounds
    import pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(chain, max_iters=3)


def test_contamination_flags(spark):
    """Benchmark decontamination: any shared 13-word-gram flags the
    doc — including a doc that merely EMBEDS a benchmark span — while
    near-misses (12 shared words) stay clean; hashed and exact modes
    agree."""
    from rsyslog_spark.datapipe.dedup import contamination_flags

    bench_text = " ".join(f"b{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, "prefix words " + " ".join(f"b{i}" for i in range(13))
             + " suffix"),                      # embeds a full 13-gram
            (2, " ".join(f"b{i}" for i in range(12)) + " different"),
            (3, "totally unrelated text " * 5),
            (4, bench_text),                    # exact benchmark copy
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(99, bench_text)],
                                  "doc_id long, text string")
    for hashed in (True, False):
        got = {
            r.doc_id: r.contaminated
            for r in contamination_flags(docs, bench, hashed=hashed)
            .collect()
        }
        assert got == {1: True, 2: False, 3: False, 4: True}, (hashed, got)


def test_drain_templates_merge(spark):
    """True-Drain second stage (r4, VERDICT r3 next #7): templates in
    the same (n_tok, first-token) group merge into '<*>' wildcards when
    position similarity >= threshold; an already-wildcarded position
    counts as a match, so the third+ member still joins; dissimilar
    templates and different-length templates never merge."""
    from rsyslog_spark.datapipe.textstats import drain_templates

    fam = "send file {} to host {} over tcp port x"
    df = spark.createDataFrame(
        [
            (fam.format("alpha", "hostA"),),
            (fam.format("alpha", "hostA"),),
            (fam.format("beta", "hostB"),),   # 8 of 10 match -> 0.8
            (fam.format("gamma", "hostC"),),  # joins via <*> positions
            ("send q w e r t y u i o",),      # same first tok + length,
            #                                   sim 3/10 -> separate
            ("restart",),                     # different length group
        ],
        "msg string",
    )
    got = {r.template: r.n for r in
           drain_templates(df, threshold=0.8).collect()}
    assert got == {
        "send file <*> to host <*> over tcp port x": 4,
        "send q w e r t y u i o": 1,
        "restart": 1,
    }


def test_token_minhash_pairs(spark):
    """Token-native MinHash (no decode/string shingling): near-identical
    token streams pair up, disjoint ones don't; short arrays (< gram_k)
    hash as one whole-array gram."""
    from rsyslog_spark.datapipe import token_minhash_pairs

    base = list(range(100))
    near = base[:95] + [999, 998, 997, 996, 995]   # ~90% shared grams
    other = list(range(1000, 1100))
    df = spark.createDataFrame(
        [("a", base), ("b", near), ("c", other), ("d", [1, 2])],
        "doc_id string, tokens array<int>",
    )
    pairs = token_minhash_pairs(df, threshold=0.6).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert ("a", "b") in got
    assert all({p[0], p[1]} <= {"a", "b"} for p in got), got


def test_mmaudit(spark):
    """mmaudit.c: type=NNNN audit(id): k=v parsing, quoted values keep
    embedded spaces, non-audit rows nulled."""
    df = spark.createDataFrame(
        [
            ('type=1300 audit(1364481363.243:24287): arch=c000003e '
             'syscall=2 exe="/usr/bin/cat more" success=yes',),
            ("ordinary message",),
        ],
        "msg string",
    )
    rows = mm.mmaudit(df).collect()
    r = rows[0]
    assert r.audit_success
    assert r.audit.hdr.auditid == "1364481363.243:24287"
    assert r.audit.hdr.type == 1300
    assert dict(r.audit.fields) == {
        "arch": "c000003e", "syscall": "2",
        "exe": "/usr/bin/cat more", "success": "yes",
    }
    assert not rows[1].audit_success and rows[1].audit is None


def test_mmrfc5424addhmac(spark):
    """mmrfc5424addhmac.c: [sdid hash="hex"] appended to 5424 SD only,
    '-' replaced, existing element untouched; the pure-Column HMAC
    matches Python's hmac byte-for-byte."""
    import hashlib
    import hmac as pyhmac

    import pyspark.sql.functions as F2

    key = b"secret-key"
    got = spark.range(1).select(
        mm.hmac_sha256(F2.lit("payload"), key).alias("h")
    ).first().h
    assert got == pyhmac.new(key, b"payload", hashlib.sha256).hexdigest()
    # >64-byte keys hash down per RFC 2104
    got2 = spark.range(1).select(
        mm.hmac_sha256(F2.lit("p"), b"k" * 100).alias("h")
    ).first().h
    assert got2 == pyhmac.new(b"k" * 100, b"p", hashlib.sha256).hexdigest()

    df = spark.createDataFrame(
        [
            ("<107>1 ... msg1", "-", 1),
            ("<107>1 ... msg2", '[ex@1 k="v"]', 1),
            ("<13>old style", "-", 0),
            ("<107>1 ... msg3", '[hmac@0 hash="deadbeef"]', 1),
        ],
        "rawmsg string, structured_data string, protocol_version int",
    )
    rows = mm.mmrfc5424addhmac(df, key).collect()
    h1 = pyhmac.new(key, b"<107>1 ... msg1", hashlib.sha256).hexdigest()
    assert rows[0].structured_data == f'[hmac@0 hash="{h1}"]'
    assert rows[1].structured_data.startswith('[ex@1 k="v"][hmac@0 hash="')
    assert rows[2].structured_data == "-"          # non-5424 untouched
    assert rows[3].structured_data == '[hmac@0 hash="deadbeef"]'  # already

    # r4 ADVICE fix: the presence check parses SD element starts like
    # isHmacPresent — '[hmac@0 ' INSIDE a quoted param value must NOT
    # suppress the append, and a no-param '[hmac@0]' element must
    df2 = spark.createDataFrame(
        [
            ("m1", '[ex@1 note="saw [hmac@0 hash] text"]', 1),
            ("m2", "[hmac@0]", 1),
            ("m3", '[ex@1 esc="\\"quoted\\""][hmac@0 hash="x"]', 1),
        ],
        "rawmsg string, structured_data string, protocol_version int",
    )
    r2 = mm.mmrfc5424addhmac(df2, key).collect()
    assert '[hmac@0 hash="' in r2[0].structured_data   # value text ignored
    assert r2[1].structured_data == "[hmac@0]"         # element present
    assert r2[2].structured_data.count("[hmac@0") == 1  # escaped quotes ok


# ---------------- datapipe: corpus curation (r5) ----------------

def test_c4_line_filter(spark):
    from rsyslog_spark.datapipe.curation import c4_line_filter

    df = spark.createDataFrame(
        [
            (1, "Good line one here.\nshort\nAnother good line stays!\n"
                "has javascript inside it.\nGood line one here.\nno punct"),
            (2, "Only one good line survives here.\nlorem ipsum dolor sit."),
            (3, "x\ny\nz"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r
            for r in c4_line_filter(df, min_lines=2).collect()}
    # within-doc dedup keeps the first occurrence only
    assert rows[1].clean_text == (
        "Good line one here.\nAnother good line stays!"
    )
    assert rows[1].n_lines_kept == 2 and rows[1].keep_doc
    # banned substring + min-words + terminal punct all fire
    assert rows[2].n_lines_kept == 1 and not rows[2].keep_doc
    assert rows[3].n_lines_kept == 0 and rows[3].clean_text == ""


def test_global_line_dedup_keeps_first_occurrence(spark):
    from rsyslog_spark.datapipe.curation import global_line_dedup

    df = spark.createDataFrame(
        [(1, "dup line\nuniq a"),
         (2, "dup line\nuniq b\ndup line"),
         (3, "dup line")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in global_line_dedup(df).collect()}
    assert rows[1].clean_text == "dup line\nuniq a"
    # later docs lose every duplicated occurrence, order preserved
    assert rows[2].clean_text == "uniq b"
    assert rows[2].n_lines_dropped == 2
    # a doc reduced to nothing still comes back (empty, all dropped)
    assert rows[3].clean_text == "" and rows[3].n_lines_kept == 0


def test_pack_sequences_greedy_and_oversize(spark):
    from rsyslog_spark.datapipe.curation import pack_sequences
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(0, 60), (1, 50), (2, 40), (3, 200), (4, 10)],
        "doc_id long, n_tokens long",
    )
    out = {r.doc_id: r for r in pack_sequences(
        df, max_tokens=100, n_buckets=1,
        bucket_expr=F.lit(0),
    ).collect()}
    # greedy in id order: [60], then 50 overflows -> [50,40], then the
    # oversize 200 gets its own bin, then 10 starts fresh
    assert (out[0].bin_id, out[0].bin_fill) == (0, 60)
    assert (out[1].bin_id, out[1].bin_fill) == (1, 50)
    assert (out[2].bin_id, out[2].bin_fill) == (1, 90)
    assert (out[3].bin_id, out[3].bin_fill) == (2, 200)
    assert (out[4].bin_id, out[4].bin_fill) == (3, 10)
    # determinism: same input -> identical assignment
    again = {r.doc_id: (r.bin_id, r.bin_fill) for r in pack_sequences(
        df, max_tokens=100, n_buckets=1, bucket_expr=F.lit(0),
    ).collect()}
    assert again == {k: (v.bin_id, v.bin_fill) for k, v in out.items()}


def test_corpus_mix_rates_caps_deterministic(spark):
    from rsyslog_spark.datapipe.curation import corpus_mix

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(400)],
        "doc_id long, domain string",
    )
    out = corpus_mix(df, rates={"a": 0.5, "b": 0.25},
                     caps={"a": 20}, seed=3)
    a = out.filter("domain = 'a'").count()
    b = out.filter("domain = 'b'").count()
    assert a == 20  # cap binds (rate 0.5 of 200 ≈ 100 > 20)
    assert 25 <= b <= 75  # ~25% of 200, LCG spread
    # replay-identical
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(r.doc_id for r in corpus_mix(
        df, rates={"a": 0.5, "b": 0.25}, caps={"a": 20}, seed=3
    ).collect())
    assert ids1 == ids2
    # different seed -> different mixture
    ids3 = sorted(r.doc_id for r in corpus_mix(
        df, rates={"a": 0.5, "b": 0.25}, caps={"a": 20}, seed=4
    ).collect())
    assert ids1 != ids3


def test_global_line_dedup_plan_single_shuffle(spark):
    """Scale shape: the dedup costs ONE exchange keyed on the line
    hash plus the doc re-assembly exchange — no joins against the
    corpus, no cartesian."""
    from rsyslog_spark.datapipe.curation import global_line_dedup

    df = spark.createDataFrame(
        [(1, "a\nb"), (2, "b\nc")], "doc_id long, text string"
    )
    plan = global_line_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_real_media_decoders(spark):
    """r5: PNM/BMP/WAV payloads decode for REAL (no codec libs needed)
    — round-trip arrays, correct features, real nearest-neighbor
    resize; codec formats keep the tagged digest stub."""
    import struct

    import numpy as np

    from rsyslog_spark.datapipe.multimodal import (
        MEDIA_SCHEMA,
        decode_bmp,
        decode_pnm,
        decode_wav,
        encode_ppm,
        encode_wav,
        resize_images,
        resize_nearest,
    )

    # PPM round-trip
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    assert (decode_pnm(encode_ppm(img)) == img).all()
    # PGM with a header comment
    pgm = b"P5\n# a comment\n3 2\n255\n" + bytes(range(6))
    assert decode_pnm(pgm).shape == (2, 3, 1)

    # BMP: build a 2x2 24-bit bottom-up image by hand and decode it
    px = np.array([[[255, 0, 0], [0, 255, 0]],
                   [[0, 0, 255], [9, 8, 7]]], dtype=np.uint8)
    stride = (2 * 3 + 3) & ~3
    body = b"".join(
        bytes(px[y, x, ::-1]) for y in (1, 0) for x in (0, 1)
    )
    rows = body[:6] + b"\0" * (stride - 6) + body[6:] + b"\0" * (stride - 6)
    bmp = (b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0,
                         len(rows), 0, 0, 0, 0) + rows)
    assert (decode_bmp(bmp) == px).all()

    # WAV round-trip: 100 Hz sine at 8 kHz, mono 16-bit
    t = np.arange(800) / 8000.0
    sig = np.sin(2 * np.pi * 100 * t).astype(np.float32)
    x, sr = decode_wav(encode_wav(sig, 8000))
    assert sr == 8000 and x.shape == (800, 1)
    assert float(np.abs(x[:, 0] - sig).max()) < 1e-3

    # end-to-end through the Spark operators
    media = spark.createDataFrame(
        [
            ("ppm1", "image", bytearray(encode_ppm(img)), "image/x-ppm",
             6, 4, None),
            ("wav1", "audio", bytearray(encode_wav(sig, 8000)),
             "audio/wav", None, None, 100),
            ("jpg1", "image", bytearray(b"\xff\xd8\xff fake jpeg"),
             "image/jpeg", 1, 1, None),
        ],
        MEDIA_SCHEMA,
    )
    from rsyslog_spark.datapipe import decode_media_batch

    rows = {r.media_id: r
            for r in decode_media_batch(media, n_features=8).collect()}
    assert rows["ppm1"].decode_ok == "ok:pnm"
    assert rows["ppm1"].features[:3] == [6.0, 4.0, 3.0]  # w, h, c
    assert rows["wav1"].decode_ok == "ok:wav"
    assert rows["wav1"].features[0] == 8000.0  # sample rate
    assert abs(rows["wav1"].features[4] - 0.707) < 0.01  # sine RMS
    assert rows["jpg1"].decode_ok == "ok:digest"  # codec → stub

    # real resize: decoded output must equal numpy nearest-neighbor
    res = {r.media_id: r
           for r in resize_images(media, 3, 2).collect()}
    out_img = decode_pnm(bytes(res["ppm1"].payload))
    assert (out_img == resize_nearest(img, 3, 2)).all()
    assert res["jpg1"].payload is not None  # stub path still flows


def test_duplicate_span_stats_first_occurrence_kept(spark):
    from rsyslog_spark.datapipe.dedup import duplicate_span_stats

    # doc 1 and doc 2 share a 4-word run; doc 1 is the first occurrence
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta unique1 unique2"),
            (2, "other words alpha beta gamma delta tail1 tail2"),
            (3, "completely fresh words here nothing shared"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in duplicate_span_stats(df, k=4, hashed=False).collect()
    }
    assert out[1]["n_removed"] == 0
    # doc 2: the duplicated 4-gram starts at pos 2 -> words 2..5 masked
    assert out[2]["n_removed"] == 4
    assert out[3]["n_removed"] == 0
    import hashlib

    assert out[2]["cleaned_fp"] == hashlib.md5(
        b"other words tail1 tail2"
    ).hexdigest()


def test_duplicate_span_stats_hashed_matches_raw(spark):
    from rsyslog_spark.datapipe.dedup import duplicate_span_stats

    df = spark.createDataFrame(
        [(i, f"w{i} common run of words here tail{i} x y z") for i in range(6)],
        "doc_id long, text string",
    )
    raw = duplicate_span_stats(df, k=5, hashed=False).orderBy("doc_id")
    hsh = duplicate_span_stats(df, k=5, hashed=True).orderBy("doc_id")
    assert [r.asDict() for r in raw.collect()] == [
        r.asDict() for r in hsh.collect()
    ]


def test_duplicate_span_stats_self_repetition(spark):
    from rsyslog_spark.datapipe.dedup import duplicate_span_stats

    # a doc repeating its own 3-gram: second occurrence masked
    df = spark.createDataFrame(
        [(1, "a b c a b c")], "doc_id long, text string"
    )
    [r] = duplicate_span_stats(df, k=3, hashed=False).collect()
    assert r["n_words"] == 6 and r["n_removed"] == 3
    import hashlib

    assert r["cleaned_fp"] == hashlib.md5(b"a b c").hexdigest()


def test_url_filter_text_extraction_and_blocklist(spark):
    from rsyslog_spark.datapipe.curation import url_filter

    df = spark.createDataFrame(
        [
            (1, "see https://a.b.tracker.org/x for details"),
            (2, "plain text no url at all"),
            (3, "ok site http://news.example.com/story?id=4 linked"),
            (4, "deep https://x.y.sample.co.uk/ multi-label suffix"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in url_filter(
            df, blocked_domains=["tracker.org", "sample.co.uk"]
        ).collect()
    }
    # subdomains of a blocked registered domain are blocked with it
    assert out[1]["url_domain"] == "tracker.org" and out[1]["url_blocked"]
    assert out[2]["url_domain"] == "" and not out[2]["url_blocked"]
    assert out[3]["url_domain"] == "example.com" and not out[3]["url_blocked"]
    assert out[4]["url_domain"] == "sample.co.uk" and out[4]["url_blocked"]


def test_url_filter_drop_unmatched(spark):
    from rsyslog_spark.datapipe.curation import url_filter

    df = spark.createDataFrame(
        [(1, "no url"), (2, "go https://example.com/")],
        "doc_id long, text string",
    )
    out = url_filter(df, [], keep_unmatched=False).collect()
    assert [r["doc_id"] for r in out] == [2]
    assert not out[0]["url_blocked"]  # empty blocklist blocks nothing


def test_dsir_weights_enrich_and_select(spark):
    """DSIR (curation.dsir_weights/dsir_select): documents drawn from
    the target vocabulary must outscore off-target documents, and the
    top-k resample must be replay-deterministic."""
    from rsyslog_spark.datapipe.curation import dsir_select, dsir_weights

    tgt_words = ["alpha", "beta", "gamma", "delta"]
    raw_words = ["uno", "dos", "tres", "quattro"]
    rows = []
    for i in range(30):
        w = tgt_words if i < 10 else raw_words
        rows.append((i, " ".join(w[j % 4] for j in range(i, i + 8)),
                     "t" if i < 10 else "r"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lab string")

    scored = dsir_weights(df, F.col("lab") == "t").toPandas()
    assert len(scored) == 30 and set(scored.columns) == {
        "doc_id", "n_words", "wt_sum"}
    by_id = scored.set_index("doc_id")["wt_sum"]
    # every target-vocab doc outscores every raw-only doc
    assert min(by_id[i] for i in range(10)) > max(
        by_id[i] for i in range(10, 30))

    sel = dsir_select(df, F.col("lab") == "t", 10).toPandas()
    assert sorted(sel["doc_id"]) == list(range(10))
    sel2 = dsir_select(df, F.col("lab") == "t", 10).toPandas()
    assert sel.equals(sel2)


def test_dsir_bucket_collision_tolerance(spark):
    """Hashed features: with few buckets, collisions shift scores but
    ranking between clearly-target and clearly-raw docs survives (the
    DSIR paper's point: bucket LMs are enough for selection)."""
    from rsyslog_spark.datapipe.curation import dsir_weights

    df = spark.createDataFrame(
        [(1, "alpha alpha alpha alpha", True),
         (2, "omega omega omega omega", False),
         (3, "alpha alpha omega omega", False)],
        "doc_id long, text string, is_t boolean",
    )
    out = dsir_weights(df, F.col("is_t"), n_buckets=8).toPandas()
    s = out.set_index("doc_id")["wt_sum"]
    assert s[1] >= s[3] >= s[2]


def test_nb_classify_learns_and_scores_unlabeled(spark):
    """textstats.nb_classify: multinomial NB with integer-exact
    scoring — learns separable classes, classifies unlabeled rows,
    breaks exact ties on the lexicographically smallest class."""
    from rsyslog_spark.datapipe.textstats import nb_classify

    rows = [
        (1, "spam spam offer offer money", "bad"),
        (2, "offer money spam spam spam", "bad"),
        (3, "theorem proof lemma theorem", "good"),
        (4, "proof theorem proof lemma", "good"),
        (5, "spam offer money spam", None),       # unlabeled, spammy
        (6, "lemma theorem proof proof", None),   # unlabeled, mathy
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lab string")
    out = nb_classify(df, "lab").toPandas().set_index("doc_id")
    assert out.loc[5, "pred_class"] == "bad"
    assert out.loc[6, "pred_class"] == "good"
    # training rows classify themselves correctly too
    assert list(out.loc[[1, 2, 3, 4], "pred_class"]) == [
        "bad", "bad", "good", "good"]
    assert (out["score"] > 0).all() and out["n_words"].sum() > 0

    # exact symmetric evidence -> identical scores -> smallest class
    tie = spark.createDataFrame(
        [(1, "xx", "aa"), (2, "yy", "zz"), (3, "xx yy", None)],
        "doc_id long, text string, lab string",
    )
    t = nb_classify(tie, "lab").toPandas().set_index("doc_id")
    assert t.loc[3, "pred_class"] == "aa"


def test_quantize_embeddings_codes_and_zero_vector(spark):
    from rsyslog_spark.datapipe.simsearch import quantize_embeddings

    df = spark.createDataFrame(
        [
            (1, [0.5, -1.0, 0.25, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),  # degenerate: all-zero
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    # m=1.0: codes = round(x*127) with half-up = [64, -127, 32, 0]
    assert rows[1].codes == [64, -127, 32, 0]
    assert abs(rows[1].q_scale - 1.0 / 127) < 1e-12
    assert rows[2].codes == [0, 0, 0, 0] and rows[2].q_scale == 0.0
    # extremes map to ±127 exactly
    assert max(abs(c) for c in rows[1].codes) == 127


def test_quantized_topk_recall_vs_exact(spark):
    from rsyslog_spark.datapipe.simsearch import quantized_topk

    corpus = _vectors(spark)
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0] + [0.0] * 6)], "q_id long, q_vec array<float>"
    )
    exact = [
        r.vec_id for r in brute_force_topk(corpus, queries, k=5).collect()
    ]
    got = quantized_topk(corpus, queries, k=5).orderBy("rank").collect()
    assert len(got) == 5
    # int8 quantization of unit-norm 2-D vectors preserves the angular
    # ordering on this fixture: top-1 agrees and recall@5 is near-total
    assert got[0].vec_id == exact[0]
    assert len(set(exact) & {r.vec_id for r in got}) >= 4
    # scores are integers, descending, ties broken by id
    assert all(
        (got[i].score, -got[i].vec_id) >= (got[i + 1].score, -got[i + 1].vec_id)
        for i in range(4)
    )


def test_ccnet_buckets_tercile_shape(spark):
    from rsyslog_spark.datapipe.curation import ccnet_buckets

    # 9 docs in one language: common-word docs must land in head,
    # rare-token docs in tail; ntile(3) splits 3/3/3
    common = "the quick brown fox jumps over the lazy dog"
    rows = []
    for i in range(6):
        rows.append((i, common + f" the fox dog {'the ' * i}", "en"))
    for i in range(6, 9):
        rows.append((i, f"zzyzx{i} qwfpg{i} vbnm{i}", "en"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = ccnet_buckets(df).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket_name, []).append(r)
    assert {len(v) for v in by_bucket.values()} == {3}
    # every gibberish doc scores below every common doc → all in tail
    assert {r.doc_id for r in by_bucket["tail"]} == {6, 7, 8}
    assert all(
        min(x.lm_score for x in by_bucket["head"])
        >= max(x.lm_score for x in by_bucket["middle"])
        for _ in [0]
    )


def test_corpus_stats_report(spark):
    from rsyslog_spark.datapipe.textstats import corpus_stats

    df = spark.createDataFrame(
        [
            (1, "one two three", "a"),
            (2, "one two", "a"),
            (3, "one", "a"),
            (4, "", "b"),          # blank doc: 0 tokens
            (5, "x y z w v", "b"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {r.source: r for r in corpus_stats(df).collect()}
    a = rows["a"]
    # nearest-rank over sorted [1,2,3]: p50 → rank ceil(1.5)=2 → 2;
    # p95 → rank ceil(2.85)=3 → 3
    assert (a.n_docs, a.tok_sum, a.tok_min, a.tok_max) == (3, 6, 1, 3)
    assert (a.tok_p50, a.tok_p95) == (2, 3)
    assert a.vocab == 3 and a.ttr_permille == 500
    b = rows["b"]
    assert (b.n_docs, b.tok_sum, b.tok_min, b.tok_max) == (2, 5, 0, 5)
    assert (b.tok_p50, b.tok_p95) == (0, 5)
    assert b.vocab == 5 and b.ttr_permille == 1000


def test_url_canonicalize_branches(spark):
    from rsyslog_spark.datapipe.curation import url_canonicalize

    cases = [
        (1, "HTTP://Example.COM:80/A/b/?utm_source=x&q=1#frag",
         "http://example.com/A/b?q=1"),
        (2, "https://user:pw@Example.com:443/a//",
         "https://example.com/a"),
        (3, "http://example.com:8080/p?fbclid=z",
         "http://example.com:8080/p"),
        (4, "ftp://example.com/x", "ftp://example.com/x"),  # passthrough
        (5, "http://example.com", "http://example.com"),
        (6, "https://example.com/?ref=tw&keep=1&utm_campaign=c",
         "https://example.com?keep=1"),
        (7, "not a url at all", "not a url at all"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in cases], "doc_id long, url string"
    )
    got = {r.doc_id: r.canon_url for r in url_canonicalize(df).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_url_dedup_first_id_survives(spark):
    from rsyslog_spark.datapipe.curation import url_dedup

    df = spark.createDataFrame(
        [
            (10, "http://A.com/x/"),
            (11, "HTTP://a.com:80/x"),
            (12, "http://a.com/y"),
        ],
        "doc_id long, url string",
    )
    rows = {r.doc_id: r for r in url_dedup(df).collect()}
    assert not rows[10].is_url_dup and rows[11].is_url_dup
    assert not rows[12].is_url_dup
    assert rows[10].canon_url == rows[11].canon_url == "http://a.com/x"


def test_chunk_sequences_stride_and_edges(spark):
    from rsyslog_spark.datapipe.tokenize import chunk_sequences

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, ""), (3, "one")],
        "doc_id long, text string",
    )
    rows = chunk_sequences(df, chunk_len=3, stride=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    got = [(r.start, r.n_tok, r.chunk_text, r.is_tail)
           for r in sorted(by_doc[1], key=lambda r: r.chunk_idx)]
    assert got == [
        (0, 3, "a b c", False), (2, 3, "c d e", False),
        (4, 3, "e f g", False), (6, 1, "g", True),
    ]
    assert 2 not in by_doc            # empty doc emits no chunks
    assert [(r.start, r.n_tok, r.is_tail) for r in by_doc[3]] == [
        (0, 1, True)
    ]
    import pytest
    with pytest.raises(ValueError):
        chunk_sequences(df, chunk_len=0)


def test_pq_encode_and_adc_topk(spark):
    from rsyslog_spark.datapipe.simsearch import (
        pq_encode,
        pq_topk,
        pq_train_codebooks,
    )

    corpus = _vectors(spark)  # 8-dim, structure in dims 1-2
    books = pq_train_codebooks(
        corpus, n_subvectors=4, n_centroids=8, iters=3
    )
    assert len(books) == 4 and len(books[0]) == 8 and len(books[0][0]) == 2
    # deterministic training: same corpus → same codebooks
    again = pq_train_codebooks(
        corpus, n_subvectors=4, n_centroids=8, iters=3
    )
    assert books == again

    coded = pq_encode(corpus, books)
    rows = coded.collect()
    assert all(len(r.pq_codes) == 4 for r in rows)
    # identical vectors get identical codes (ids ≡ mod 10 are dups)
    by_angle = {}
    for r in rows:
        by_angle.setdefault(r.vec_id % 10, set()).add(tuple(r.pq_codes))
    assert all(len(s) == 1 for s in by_angle.values())

    queries = spark.createDataFrame(
        [(0, [1.0, 0.0] + [0.0] * 6)], "q_id long, q_vec array<float>"
    )
    exact = {
        r.vec_id for r in brute_force_topk(corpus, queries, k=5).collect()
    }
    approx = {
        r.vec_id for r in pq_topk(corpus, queries, books, k=5).collect()
    }
    # only dims 1-2 carry signal; 8 centroids for 10 angles means
    # adjacent angles can share a centroid (equal ADC scores, id
    # tie-break) — so assert semantic nearness plus majority recall,
    # not exact-set equality
    assert len(exact & approx) >= 3
    import math

    for vid in approx:
        assert math.cos((vid % 10) * math.pi / 20) >= math.cos(
            math.pi / 10
        ) - 1e-9  # every hit is within one angle step of the query
    import pytest

    with pytest.raises(ValueError):
        pq_train_codebooks(corpus, n_subvectors=3)


def test_badwords_filter_exact_token_match(spark):
    """textstats.badwords_filter: C4 §2.2 blocklist page filter —
    lowercased, punctuation-stripped whole-token matches only."""
    from rsyslog_spark.datapipe.textstats import badwords_filter

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "the SLOW, old dog"),          # case + trailing punct
            (3, "slowly does it"),              # substring must NOT hit
            (4, "slow slow 'slow!' ok"),        # 3 hits
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.bad_hits, r.kept)
        for r in badwords_filter(df, ["Slow", "bad"]).collect()
    }
    assert out[1] == (0, True)
    assert out[2] == (1, False)
    assert out[3] == (0, True)
    assert out[4] == (3, False)
    assert out[5] == (0, True)


def test_bm25_topk_matches_python_reference(spark):
    """textstats.bm25_topk: scores equal a plain-Python BM25 with the
    same pre-log idf variant; ranking and tie-break deterministic."""
    from rsyslog_spark.datapipe.textstats import bm25_topk

    corpus = [
        (1, "spark shuffle join spark spark"),
        (2, "spark join"),
        (3, "filter scan merge sort"),
        (4, "join join join join join join join join"),
        (5, "spark"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    terms, k1, b = ["spark", "join"], 1.2, 0.75

    docs = {i: t.split() for i, t in corpus}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    df_t = {t: sum(t in w for w in docs.values()) for t in terms}

    def score(i):
        s = 0.0
        for t in terms:
            tf = docs[i].count(t)
            idf = ((n - df_t[t]) + 0.5) / (df_t[t] + 0.5)
            den = tf + (k1 * (1 - b) + (k1 * b) * (len(docs[i]) / avgdl))
            s += idf * ((tf * (k1 + 1)) / den)
        return s

    expect = sorted(
        (i for i in docs if any(t in docs[i] for t in terms)),
        key=lambda i: (-score(i), i),
    )
    got = bm25_topk(df, terms, k=4, k1=k1, b=b).collect()
    assert [r.doc_id for r in got] == expect[:4]
    assert [r.rank for r in got] == [1, 2, 3, 4]
    for r in got:
        assert abs(r.score - score(r.doc_id)) < 1e-12
    # doc 3 has no query term: never returned even with huge k
    all_ids = {r.doc_id for r in bm25_topk(df, terms, k=50).collect()}
    assert all_ids == {1, 2, 4, 5}
    import pytest

    with pytest.raises(ValueError):
        bm25_topk(df, [])


def test_badwords_phrases_and_punctuated_entries(spark):
    """code-review r5: the real C4 blocklist contains phrases and
    punctuated entries — both must match after normalization."""
    import pytest as _pt
    from rsyslog_spark.datapipe.textstats import badwords_filter

    df = spark.createDataFrame(
        [
            (1, "the deep throat reference"),     # phrase hit
            (2, "deep water, throat lozenge"),    # words split -> no hit
            (3, "say F*CK! loudly"),               # punctuated entry
            (4, "fck without the star"),           # different token
            (5, "slow slow slow"),                 # 3 overlapping hits
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.bad_hits, r.kept)
        for r in badwords_filter(
            df, ["Deep Throat", "f*ck", "slow!"]
        ).collect()
    }
    assert out[1] == (1, False)
    assert out[2] == (0, True)
    assert out[3] == (1, False)
    assert out[4] == (0, True)
    assert out[5] == (3, False)
    with _pt.raises(ValueError, match="normalizes to nothing"):
        badwords_filter(df, ["!!!"])


def test_gopher_quality_rules(spark):
    """textstats.gopher_quality: each Rae et al. A1.1 rule trips on a
    crafted doc; a clean doc passes."""
    from rsyslog_spark.datapipe.textstats import gopher_quality

    good = ("the data and that pipeline have run with care " * 7)[:-1]
    docs = [
        (1, good),                                   # passes all rules
        (2, "the and short doc"),                    # < 50 words
        (3, ("xx " * 60)[:-1]),                      # mean wl 2 < 3
        (4, good + " " + "#" * 1 + " ###### ##"),    # symbols > 10%?
        (5, ("the of " + "123 456 789 000 " * 20)),  # alpha < 80%
        (6, ("zzz " * 60)[:-1]),                     # no stop words
        (7, "- item one\n- item two\n- item three\n" + good),  # bullets ok
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_quality(df).collect()}
    assert out[1].gopher_pass
    assert out[1].g_stop_hits == 5  # the/and/that/have/with
    assert not out[2].gopher_pass and out[2].g_n_words == 4
    assert not out[3].gopher_pass and out[3].g_mean_wl_pm == 2000
    assert not out[5].gopher_pass and out[5].g_alpha_pm < 800
    assert not out[6].gopher_pass and out[6].g_stop_hits == 0
    # bullet fraction 3/4 lines <= 90% -> still pass
    assert out[7].gopher_pass and out[7].g_bullet_pm == 750
    # ellipsis line-end rule
    many_ell = "\n".join(["line one ..."] * 4 + [good])
    df2 = spark.createDataFrame([(8, many_ell)], "doc_id long, text string")
    r = gopher_quality(df2).collect()[0]
    assert r.g_ellipsis_pm == 800 and not r.gopher_pass


def test_token_dup_spans(spark):
    """dedup.token_dup_spans: cross-doc first occurrence survives,
    within-doc repetition masks the second copy, token-native."""
    from rsyslog_spark.datapipe.dedup import token_dup_spans

    b = list(range(500, 515))
    docs = [
        (1, list(range(7, 27)) + [101, 102]),   # shared block, first
        (2, list(range(7, 27)) + [201, 202]),   # shared block, later
        (3, list(range(300, 325))),             # unique run
        (4, b + b),                             # self-repeat
    ]
    df = spark.createDataFrame(docs, "doc_id long, tokens array<int>")
    out = {r.doc_id: r for r in token_dup_spans(df, k=13).collect()}
    assert out[1].n_removed == 0 and out[1].n_toks == 22
    assert out[2].n_removed == 20          # whole shared block masked
    assert out[3].n_removed == 0
    assert out[4].n_removed == 15 and out[4].n_toks == 30
    import hashlib
    exp = hashlib.md5(" ".join(map(str, b)).encode()).hexdigest()
    assert out[4].cleaned_fp == exp
    exp2 = hashlib.md5(" ".join(map(str, [201, 202])).encode()).hexdigest()
    assert out[2].cleaned_fp == exp2
