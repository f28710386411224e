"""NSVB anchor against PUBLISHED artifacts only — no repo-authored oracle.

Every prior NSVB gate compares the engine to material authored inside this
repo (the DuckDB twin, ``tools/nsvb_golden_calc.py``).  This test removes
the builder from the oracle side entirely for the subset of the chain
where that is possible without external data access:

For a LIVE tree with no broken top (``ACTUALHT == HT``), ``CULL = 0`` and
``STATUSCD = 1``, the published CRM2 chain collapses algebraically to the
closed-form equations printed in the published artifacts themselves —
no bisection, no deduction, no harmonization residue:

- ``VTOTIB_GROSS`` and ``VTOTBK_GROSS`` are direct evaluations of the
  published stem-wood and stem-bark volume equations
  (``data-raw/equation_forms_and_calls.csv``; reference
  ``R/predictCRM2.R:691-699`` evaluates exactly these strings, and
  ``R/predictCRM2.R:65-74`` shows bark volume is its own equation, with
  ``VTOTOB = VTOTIB + VTOTBK``);
- ``DRYBIO_AG == Total`` — with no damage the component reduction factor
  is 1 (``R/predictCRM2.R:474-479``: ``Total_Reduced = Total * 1``);
- ``CARBON_AG == Total * CARBON_RATIO_LIVE(SPCD)``
  (``R/predictCRM2.R:542-543``).

The EXPECTED values below are therefore computed INLINE, in one line of
arithmetic each, from coefficient literals transcribed from the published
FIA coefficient files (citations per tree).  The transcriptions are the
only thing a builder could get wrong here, and each is a copy-paste of a
single CSV row that a reviewer can eyeball against
``/root/reference/data-raw/coef_files/combined/*.csv`` — unlike a
488-line re-derivation, there is no room for a shared systematic error.

Equation forms (verbatim from ``equation_forms_and_calls.csv:1-14``,
breakpoints ``k=9``/softwood from ``R/predictCRM2.R:24``):

- eq 3:  ``a * DBH^b * THT^c``
- eq 4:  ``DBH < k ? a0*DBH^b0*THT^c : a0*k^(b0-b1)*DBH^b1*THT^c``
- eq 5:  ``a * DBH^(a1*(1-exp(-b1*DBH))^c1) * THT^c``
- eq 50: ``a * DBH^b * THT^c * exp(-(b2*DBH))``
"""

from __future__ import annotations

import math

import pytest

from foresttime_builder_spark.plans import carbon

# Closed-form evaluators — the published RHS strings, verbatim.
eq3 = lambda D, H, a, b, c: a * D**b * H**c
eq4 = lambda D, H, a0, b0, b1, c, k: (
    a0 * D**b0 * H**c if D < k else a0 * k ** (b0 - b1) * D**b1 * H**c
)
eq5 = lambda D, H, a, a1, b1, c1, c: (
    a * D ** (a1 * (1 - math.exp(-b1 * D)) ** c1) * H**c
)
eq50 = lambda D, H, a, b, c, b2: a * D**b * H**c * math.exp(-(b2 * D))


def _expected():
    """One entry per tree: every coefficient literal below is transcribed
    from a single row of the published coefficient CSVs (cited), and every
    derived number is one arithmetic expression over them."""
    out = {}

    # ------------------------------------------------------------------
    # A: live loblolly pine, SPCD 131, ECOSUBCD 232Ce -> DIVISION 230,
    #    DBH 11.3 in, THT 72 ft.
    # volib_coefs.csv row "131 230" (eq 3); volbk_coefs.csv row "131 230"
    # (eq 3); total_biomass_coefs.csv row "131 230" (eq 4, softwood k=9);
    # REF_SPECIES.csv SPCD=131 CARBON_RATIO_LIVE=0.477.
    D, H = 11.3, 72.0
    vib = eq3(D, H, 0.001265179735, 1.924197682663, 1.179503154748)
    vbk = eq3(D, H, 0.006552546647, 1.935687677716, 0.407960682315)
    tot = eq4(D, H, 0.04592891185, 1.956540143489, 1.955393941701,
              1.154203033178, 9.0)
    out["a_loblolly_live"] = (vib, vbk, tot, tot * 0.477)

    # ------------------------------------------------------------------
    # B: live red maple, SPCD 316, ECOSUBCD M221Dc -> DIVISION M220,
    #    DBH 13.4 in, THT 68 ft.
    # volib row "316 M220" (eq 3); volbk row "316 M220" (eq 4,
    # hardwood k=11, R/predictCRM2.R:24); total row "316 M220" (eq 50);
    # REF_SPECIES CARBON_RATIO_LIVE=0.486.
    D, H = 13.4, 68.0
    vib = eq3(D, H, 0.003240913758, 1.951577767367, 0.926042886904)
    vbk = eq4(D, H, 0.000568208705, 1.943167982009, 1.680022557335,
              0.901331324238, 11.0)
    tot = eq50(D, H, 1.742544317943, 1.672298097616, 0.340272222219,
               -0.065397569653)
    out["b_redmaple_live"] = (vib, vbk, tot, tot * 0.486)

    # ------------------------------------------------------------------
    # C: live natural slash pine, SPCD 111, ECOSUBCD 232Bg -> DIVISION 230,
    #    DBH 12.4 in, THT 78 ft.
    # volib row "111 230" (eq 4, k=9); volbk row "111 230" (eq 50);
    # total row "111 230" (eq 4, k=9); REF_SPECIES CARBON_RATIO_LIVE=0.513.
    D, H = 12.4, 78.0
    vib = eq4(D, H, 0.001206001018, 2.141422638603, 1.948751731516,
              1.068957336774, 9.0)
    vbk = eq50(D, H, 0.004307564283, 2.013121858813, 0.586315835574,
               0.016967350124)
    tot = eq4(D, H, 0.177868613979, 2.180014221873, 1.976884887621,
              0.783195359668, 9.0)
    out["c_slash_live"] = (vib, vbk, tot, tot * 0.513)

    # ------------------------------------------------------------------
    # D: PLANTED slash pine (STDORGCD=1 -> coefficient species "1_111",
    #    reference R/estimate_carbon.R:48-52), ECOSUBCD 232Bg -> DIV 230,
    #    DBH 7.6 in, THT 52 ft.
    # volib row "1_111 230" (eq 50, note published b2 is negative);
    # volbk row "1_111 230" (eq 3); total row "1_111 230" (eq 5);
    # carbon ratio keyed on the UNPREFIXED SPCD 111 -> 0.513.
    D, H = 7.6, 52.0
    vib = eq50(D, H, 0.001776284506, 1.982526950495, 1.022562886817,
               -0.009785143489)
    vbk = eq3(D, H, 0.002964212597, 1.78409261844, 0.764628515329)
    tot = eq5(D, H, 0.358815475473, 1.849604207438, 0.149984321283,
              0.332484731464, 0.841295541293)
    out["d_slash_planted"] = (vib, vbk, tot, tot * 0.513)

    return out


EXPECTED = _expected()

# (tag, SPCD, DIA, HT, ACTUALHT, CR, CULL, STATUSCD, SDCD, DECAYCD,
#  STDORGCD, ECOSUBCD) — all live, undamaged, cull-free: the regime where
# the chain is algebraically closed-form.
TREES = [
    ("a_loblolly_live", 131, 11.3, 72.0, 72.0, 40.0, 0.0, 1, None, None, 0, "232Ce"),
    ("b_redmaple_live", 316, 13.4, 68.0, 68.0, 55.0, 0.0, 1, None, None, 0, "M221Dc"),
    ("c_slash_live", 111, 12.4, 78.0, 78.0, 38.0, 0.0, 1, None, None, 0, "232Bg"),
    ("d_slash_planted", 111, 7.6, 52.0, 52.0, 33.0, 0.0, 1, None, None, 1, "232Bg"),
]

SCHEMA = (
    "tree_ID string, SPCD int, DIA double, HT double, ACTUALHT double, "
    "CR double, CULL double, STATUSCD int, STANDING_DEAD_CD int, "
    "DECAYCD int, STDORGCD int, ECOSUBCD string"
)

#: closed-form expectations share the engine's double arithmetic down to
#: libm differences — far tighter than the reference's published-value bar
#: of 1e-3 (test-estimate_carbon.R:55-56)
REL = 1e-9


@pytest.fixture(scope="module")
def estimated(spark):
    df = spark.createDataFrame([tuple(t) for t in TREES], schema=SCHEMA)
    prepped = carbon.prep_carbon(df)
    contract = {
        r["tree_ID"]: r.asDict()
        for r in carbon.estimate_carbon(prepped).collect()
    }
    full = {
        r["tree_ID"]: r.asDict()
        for r in carbon.estimate_carbon(prepped, keep_all=True).collect()
    }
    return contract, full


@pytest.mark.parametrize("tag", [t[0] for t in TREES])
def test_engine_matches_published_closed_forms(estimated, tag):
    contract, full = estimated
    vib, vbk, tot, carb = EXPECTED[tag]
    assert full[tag]["VTOTIB_GROSS"] == pytest.approx(vib, rel=REL), f"{tag}.VTOTIB"
    assert full[tag]["VTOTBK_GROSS"] == pytest.approx(vbk, rel=REL), f"{tag}.VTOTBK"
    assert contract[tag]["DRYBIO_AG"] == pytest.approx(tot, rel=REL), f"{tag}.DRYBIO_AG"
    assert contract[tag]["CARBON_AG"] == pytest.approx(carb, rel=REL), f"{tag}.CARBON_AG"


def test_transcribed_coefficients_match_vendored_resources(spark):
    """The literal coefficients above must equal the rows in the vendored
    resource CSVs the engine actually loads — catches a transcription
    drift on either side (the vendored copies themselves are verified
    against the reference's data-raw files by tests/test_nsvb.py)."""
    import csv
    import os

    res = os.path.join(
        os.path.dirname(carbon.__file__), "..", "resources", "coefs"
    )

    def row(fname, key):
        with open(os.path.join(res, fname)) as f:
            for r in csv.DictReader(f):
                if r.get("SPCD_DIVISION") == key:
                    return r
        raise AssertionError(f"{key} not found in {fname}")

    assert float(row("volib_coefs.csv", "131 230")["a"]) == 0.001265179735
    assert float(row("volib_coefs.csv", "1_111 230")["b2"]) == -0.009785143489
    assert float(row("volbk_coefs.csv", "316 M220")["a0"]) == 0.000568208705
    assert float(row("total_biomass_coefs.csv", "111 230")["a0"]) == 0.177868613979
    assert float(row("total_biomass_coefs.csv", "1_111 230")["a1"]) == 1.849604207438
