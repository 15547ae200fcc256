"""Deep fuzz of the Python carrier algebra — no SparkSession needed.

The Column-level laws are covered by `tests/test_core_algebra.py` (fixed
vectors + the agg/agg_carrier/lift cross-checks); those run one Spark job
per case, so their hypothesis budgets are small. The PYTHON side of the
same algebra (py_lift / py_merge / py_agg — the streaming stateful
summer's state-update path, reference online/executor/Summer.scala:101-108)
is pure and microsecond-cheap, so it can afford hundreds of randomized
examples per law: random inputs, random 3-way splits, both association
orders.

Laws checked:
  * split-merge: py_agg(xs) == py_merge(py_agg(xs[:i]), py_agg(xs[i:]))
    — the identity every rollforward / k-step==one-shot property rests on
  * associativity: (a⊕b)⊕c == a⊕(b⊕c) over carriers built from real folds
  * sketch-carrier merges (cms / weighted cms / bloom) over SYNTHETIC
    carriers, since their lifts hash JVM-side by design
  * Misra-Gries GUARANTEES (not carrier equality — MG merge is only
    guarantee-associative): coverage, underestimate, n/(k+1) error bound,
    under both association orders

Float caveat handled by construction: moments raws are small integers, so
every power sum is an integer far below 2^53 and double addition is exact
(and therefore associative) — no tolerance fudging that could mask a real
merge bug.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from summingbird_spark.core.semigroup import get

_TEXT = st.text(alphabet="abcdef", min_size=0, max_size=5)

# name -> (element strategy, result normalizer)
EXACT = {
    "sum": (st.integers(-(10**9), 10**9), lambda v: v),
    "sum_long": (st.integers(-(10**9), 10**9), lambda v: v),
    "count": (st.integers(-5, 5), lambda v: v),
    "min": (st.integers(-(10**9), 10**9), lambda v: v),
    "max": (st.integers(-(10**9), 10**9), lambda v: v),
    "first": (st.integers(-(10**9), 10**9), lambda v: v),
    "avg": (st.integers(-(10**6), 10**6), lambda v: (v["s"], v["n"])),
    "moments": (
        st.integers(-8, 8).map(float),
        lambda v: tuple(v[k] for k in ("n", "s1", "s2", "s3", "s4")),
    ),
    "set": (_TEXT, lambda v: sorted(v)),
    "list": (_TEXT, lambda v: list(v)),
    "concat": (_TEXT, lambda v: v),
    "top10": (st.integers(-100, 100), lambda v: list(v)),
    "qsketch": (st.integers(0, 50).map(float), lambda v: dict(v)),
}


@settings(max_examples=600, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_py_carrier_split_and_assoc_fuzz(data):
    name = data.draw(st.sampled_from(sorted(EXACT)))
    elem, norm = EXACT[name]
    xs = data.draw(st.lists(elem, min_size=3, max_size=24))
    i = data.draw(st.integers(min_value=1, max_value=len(xs) - 2))
    j = data.draw(st.integers(min_value=i + 1, max_value=len(xs) - 1))
    sg = get(name)

    whole = norm(sg.py_agg(xs))
    two = norm(sg.py_merge(sg.py_agg(xs[:i]), sg.py_agg(xs[i:])))
    assert two == whole, (name, "split-merge", xs, i)

    a, b, c = sg.py_agg(xs[:i]), sg.py_agg(xs[i:j]), sg.py_agg(xs[j:])
    left = norm(sg.py_merge(sg.py_merge(a, b), c))
    right = norm(sg.py_merge(a, sg.py_merge(b, c)))
    assert left == right == whole, (name, "assoc", xs, i, j)


# synthetic sketch carriers: cms maps position->count (map-add), bloom is a
# fixed-width list of bitset words (elementwise OR). Lifts are JVM-only by
# design, but py_merge must still be a lawful semigroup on prebuilt
# carriers — it is what the streaming summer folds between triggers.
_CMS_CARRIER = st.dictionaries(
    st.integers(0, 255), st.integers(1, 10**9), max_size=24
)
_BLOOM_CARRIER = st.lists(
    st.integers(0, 2**63 - 1), min_size=16, max_size=16
)


@settings(max_examples=400, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_sketch_carrier_merge_fuzz(data):
    name = data.draw(st.sampled_from(["cms64x4", "cms64x4w", "bloom1024x3"]))
    carrier = _BLOOM_CARRIER if name == "bloom1024x3" else _CMS_CARRIER
    a = data.draw(carrier)
    b = data.draw(carrier)
    c = data.draw(carrier)
    sg = get(name)
    left = sg.py_merge(sg.py_merge(a, b), c)
    right = sg.py_merge(a, sg.py_merge(b, c))
    assert left == right, (name, "assoc", a, b, c)
    # both are commutative structures (map-add / bitwise-or)
    assert sg.py_merge(a, b) == sg.py_merge(b, a), (name, "comm", a, b)


@settings(max_examples=400, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    xs=st.lists(st.text(alphabet="abcdefghij", min_size=1, max_size=2),
                min_size=3, max_size=60),
    i=st.data(),
)
def test_misra_gries_guarantees_fuzz(xs, i):
    """MG carriers are only guarantee-associative: fuzz the GUARANTEES the
    graded row (`heavy_hitters_value_buckets`) asserts, under both
    association orders of a random 3-way split."""
    sg = get("mg8")
    k = sg.k
    lo = i.draw(st.integers(min_value=1, max_value=len(xs) - 2))
    hi = i.draw(st.integers(min_value=lo + 1, max_value=len(xs) - 1))
    a, b, c = sg.py_agg(xs[:lo]), sg.py_agg(xs[lo:hi]), sg.py_agg(xs[hi:])
    true = {}
    for x in xs:
        true[x] = true.get(x, 0) + 1
    n = len(xs)
    bound = n / (k + 1)
    for summary in (
        sg.py_merge(sg.py_merge(a, b), c),
        sg.py_merge(a, sg.py_merge(b, c)),
    ):
        for item, est in summary.items():
            assert est <= true.get(item, 0), ("underestimate", item, est, true)
            assert true[item] - est <= bound, ("error bound", item, est, true)
        for item, cnt in true.items():
            if cnt > bound:
                assert item in summary, ("coverage", item, cnt, bound, summary)
