"""NSVB deduction-regime anchors against PUBLISHED artifacts only.

``tests/test_nsvb_published_anchor.py`` removed the builder from the oracle
loop for LIVE, undamaged, cull-free trees — the regime where CRM2 collapses
to the published closed-form equations.  This file extends the same
inline-arithmetic discipline to the three DEDUCTION regimes, which are
*also* closed-form because none of them touches the bisection
(``findHT``) — every factor below is published algebra:

- **Broken top** (``ACTUALHT < HT``, live): the height-ratio adjustment is
  the published cumulative-volume ratio profile evaluated at the break,
  ``HT_RAT_ADJ = (1-(1-ACTUALHT/THT)^alpha)^beta`` with the rcumib
  alpha/beta row (``R/predictCRM2.R:227-240`` — equation 6.1 dispatches to
  form 6 of ``equation_forms_and_calls.csv``, RHS
  ``(1 - (1 - X)^alpha)^beta``); the branch deduction is the broken crown
  proportion (``R/predictCRM2.R:436-460``).
- **Standing dead** (``STATUSCD = 2``): wood/bark/branch decay proportions
  and the dead carbon ratio come from single rows of the published
  ``REF_TREE_DECAY_PROP.csv`` / ``REF_TREE_CARBON_RATIO_DEAD.csv``
  (``R/prep_carbon.R:25-82``); cull reduction is forced to 1 for dead
  trees (``R/predictCRM2.R:425-429``).
- **Cull** (live, ``CULL > 0``): ``CULL_REDUCTION =
  1 - (1 - CULL_DECAY_RATIO) * CULL/100`` where ``CULL_DECAY_RATIO`` is
  the DECAYCD=3 density proportion for the species group
  (``R/prep_carbon.R:44-63``); sound volume applies the plain
  ``1 - CULL/100`` (``R/predictCRM2.R:293-307``).

The component chain shared by all three (``R/predictCRM2.R:419-479,
534-543``):

    Wood   = VTOTIB_GROSS * WDSG * 62.4
    ARF    = (Wood*WOOD_RED + Bark*BARK_RED + Branch*BRANCH_RED)
             / (Wood + Bark + Branch)
    DRYBIO_AG = Total * ARF;   CARBON_AG = DRYBIO_AG * C_FRAC/100

where Bark / Branch / Total are direct evaluations of the published
bark_biomass / branch_biomass / total_biomass equations.  Every
coefficient literal below is transcribed from ONE row of the published
CSVs (cited per block) — there is no repo-authored oracle anywhere in
this file.
"""

from __future__ import annotations

import math

import pytest

from foresttime_builder_spark.plans import carbon

# published RHS forms, verbatim (equation_forms_and_calls.csv:1-14)
eq3 = lambda D, H, a, b, c: a * D**b * H**c
eq4 = lambda D, H, a0, b0, b1, c, k: (
    a0 * D**b0 * H**c if D < k else a0 * k ** (b0 - b1) * D**b1 * H**c
)
eq50 = lambda D, H, a, b, c, b2: a * D**b * H**c * math.exp(-(b2 * D))

# ---------------------------------------------------------------------------
# Published per-(SPCD, DIVISION) rows, transcribed verbatim from
# /root/reference/data-raw/coef_files/combined/*.csv (key cited per line)
# and REF_SPECIES.csv (WDSG = WOOD_SPGR_GREENVOL_DRYWT, CARBON_RATIO_LIVE).
# Each species entry: closed-form callables D,H -> value.
SPECIES = {
    # loblolly pine "131 230": volib eq3; volbk eq3; bark_biomass eq50;
    # branch_biomass eq3; total_biomass eq4 (softwood k=9); rcumib row.
    131: dict(
        grp="S",
        wdsg=0.47,   # REF_SPECIES.csv SPCD=131
        crl=0.477,   # REF_SPECIES.csv SPCD=131 CARBON_RATIO_LIVE
        vib=lambda D, H: eq3(D, H, 0.001265179735, 1.924197682663, 1.179503154748),
        vbk=lambda D, H: eq3(D, H, 0.006552546647, 1.935687677716, 0.407960682315),
        bark=lambda D, H: eq50(D, H, 0.03561408098, 1.384818215711,
                               0.887335694383, -0.03493278539),
        branch=lambda D, H: eq3(D, H, 0.612149319777, 3.174475139615,
                                -0.655518923061),
        total=lambda D, H: eq4(D, H, 0.04592891185, 1.956540143489,
                               1.955393941701, 1.154203033178, 9.0),
        alpha=2.084027404329, beta=0.88992991865,  # rcumib_coefs.csv "131 230"
    ),
    # red maple "316 M220": volib eq3; volbk eq4 (hardwood k=11); bark eq3;
    # branch eq3; total eq50; rcumib row.
    316: dict(
        grp="H",
        wdsg=0.49,
        crl=0.486,
        vib=lambda D, H: eq3(D, H, 0.003240913758, 1.951577767367, 0.926042886904),
        vbk=lambda D, H: eq4(D, H, 0.000568208705, 1.943167982009,
                             1.680022557335, 0.901331324238, 11.0),
        bark=lambda D, H: eq3(D, H, 0.02544808104, 1.796895609168, 0.897411906351),
        branch=lambda D, H: eq3(D, H, 0.013549262378, 4.309841290083,
                                -0.246339129402),
        total=lambda D, H: eq50(D, H, 1.742544317943, 1.672298097616,
                                0.340272222219, -0.065397569653),
        alpha=2.539226776257, beta=0.898401820199,  # rcumib "316 M220"
    ),
    # slash pine "111 230": volib eq4 (k=9); volbk eq50; bark eq3;
    # branch eq3; total eq4 (k=9); rcumib row.
    111: dict(
        grp="S",
        wdsg=0.54,
        crl=0.513,
        vib=lambda D, H: eq4(D, H, 0.001206001018, 2.141422638603,
                             1.948751731516, 1.068957336774, 9.0),
        vbk=lambda D, H: eq50(D, H, 0.004307564283, 2.013121858813,
                              0.586315835574, 0.016967350124),
        bark=lambda D, H: eq3(D, H, 0.046930236707, 0.819023691216, 1.393983197086),
        branch=lambda D, H: eq3(D, H, 0.858432090597, 3.748201042703,
                                -1.095286702643),
        total=lambda D, H: eq4(D, H, 0.177868613979, 2.180014221873,
                               1.976884887621, 0.783195359668, 9.0),
        alpha=2.032340091912, beta=0.830535356908,  # rcumib "111 230"
    ),
}

# REF_TREE_DECAY_PROP.csv rows: (grp, DECAYCD) -> (DENSITY_PROP,
# BARK_LOSS_PROP, BRANCH_LOSS_PROP)
DECAY_PROP = {
    ("S", 2): (1.0, 0.8, 0.5),
    ("S", 3): (0.92, 0.5, 0.1),
    ("S", 4): (0.55, 0.2, 0.0),
    ("H", 2): (0.8, 0.8, 0.5),
    ("H", 3): (0.54, 0.5, 0.1),
}
# REF_TREE_CARBON_RATIO_DEAD.csv rows: (grp, DECAYCD) -> CARBON_RATIO
CARBON_RATIO_DEAD = {
    ("S", 2): 0.504,
    ("S", 3): 0.506,
    ("S", 4): 0.52,
    ("H", 2): 0.473,
}
# CULL_DECAY_RATIO = DENSITY_PROP at DECAYCD=3 for the group
# (R/prep_carbon.R:44-52)
CULL_DECAY_RATIO = {"S": 0.92, "H": 0.54}

# ---------------------------------------------------------------------------
# trees: (tag, SPCD, DIA, HT, ACTUALHT, CR, CULL, STATUSCD, SDCD, DECAYCD)
# All in division 230 / M220 via the ECOSUBCDs of the live-anchor file.
ECOSUB = {131: "232Ce", 316: "M221Dc", 111: "232Bg"}

TREES = [
    # --- broken top, live (ACTUALHT < HT, CULL = 0) ---
    ("bt_loblolly", 131, 11.3, 72.0, 55.0, 40.0, 0.0, 1, None, None),
    ("bt_redmaple", 316, 13.4, 68.0, 51.0, 55.0, 0.0, 1, None, None),
    ("bt_slash", 111, 12.4, 78.0, 60.0, 38.0, 0.0, 1, None, None),
    # --- standing dead, unbroken (STATUSCD = 2, CULL = 0) ---
    ("sd_loblolly_d3", 131, 11.3, 72.0, 72.0, 40.0, 0.0, 2, 1, 3),
    ("sd_redmaple_d2", 316, 13.4, 68.0, 68.0, 55.0, 0.0, 2, 1, 2),
    ("sd_slash_d4", 111, 12.4, 78.0, 78.0, 38.0, 0.0, 2, 1, 4),
    # --- cull, live, unbroken ---
    ("cu_loblolly_30", 131, 11.3, 72.0, 72.0, 40.0, 30.0, 1, None, None),
    ("cu_redmaple_45", 316, 13.4, 68.0, 68.0, 55.0, 45.0, 1, None, None),
    ("cu_slash_20", 111, 12.4, 78.0, 78.0, 38.0, 20.0, 1, None, None),
]


def _expected(tree):
    """Reference chain R/predictCRM2.R:419-479,534-543 + 244/292-307,
    evaluated inline over the published literals above."""
    tag, spcd, D, tht, aht, cr, cull, statuscd, sdcd, decaycd = tree
    sp = SPECIES[spcd]
    vib, vbk = sp["vib"](D, tht), sp["vbk"](D, tht)
    wood = vib * sp["wdsg"] * 62.4
    bark, branch, total = sp["bark"](D, tht), sp["branch"](D, tht), sp["total"](D, tht)

    broken = aht < tht
    hr = (1 - (1 - aht / tht) ** sp["alpha"]) ** sp["beta"] if broken else 1.0

    if statuscd == 1:  # live
        wd = bk = br = 1.0
        cull_red = 1 - (1 - CULL_DECAY_RATIO[sp["grp"]]) * cull / 100
        cfrac = sp["crl"]
    else:  # standing dead
        wd, bk, br = DECAY_PROP[(sp["grp"], decaycd)]
        cull_red = 1.0  # R/predictCRM2.R:425-429 (STANDING_DEAD_CD >= 1)
        cfrac = CARBON_RATIO_DEAD[(sp["grp"], decaycd)]

    if not broken:
        bcp = 1.0  # R/predictCRM2.R:458
    else:
        crprop = 1 - aht / tht * (1 - max(cr, 1.0) / 100)
        bcp = max((aht - (1 - crprop) * tht) / (crprop * tht), 0.0)
        bcp = 0.0 if bcp < 0.01 else bcp

    wood_red = hr * cull_red * wd
    bark_red = hr * bk * wd
    branch_red = bcp * br * wd
    arf = (wood * wood_red + bark * bark_red + branch * branch_red) / (
        wood + bark + branch
    )
    drybio = total * arf
    return dict(
        VTOTIB_SOUND=vib * hr * (1 - cull / 100 if cull < 99 else 0.0),
        VTOTBK_SOUND=vbk * hr * bk,
        HT_RAT_ADJ=hr,
        DRYBIO_AG=drybio,
        CARBON_AG=drybio * cfrac,
    )


SCHEMA = (
    "tree_ID string, SPCD int, DIA double, HT double, ACTUALHT double, "
    "CR double, CULL double, STATUSCD int, STANDING_DEAD_CD int, "
    "DECAYCD int, STDORGCD int, ECOSUBCD string"
)

REL = 1e-9


@pytest.fixture(scope="module")
def estimated(spark):
    rows = [
        (t[0], t[1], t[2], t[3], t[4], t[5], t[6], t[7], t[8], t[9], 0,
         ECOSUB[t[1]])
        for t in TREES
    ]
    df = spark.createDataFrame(rows, schema=SCHEMA)
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


@pytest.mark.parametrize("tree", TREES, ids=[t[0] for t in TREES])
def test_engine_matches_published_deduction_algebra(estimated, tree):
    contract, full = estimated
    tag = tree[0]
    exp = _expected(tree)
    assert full[tag]["HT_RAT_ADJ"] == pytest.approx(exp["HT_RAT_ADJ"], rel=REL)
    assert full[tag]["VTOTIB_SOUND"] == pytest.approx(exp["VTOTIB_SOUND"], rel=REL)
    assert full[tag]["VTOTBK_SOUND"] == pytest.approx(exp["VTOTBK_SOUND"], rel=REL)
    assert contract[tag]["DRYBIO_AG"] == pytest.approx(exp["DRYBIO_AG"], rel=REL)
    assert contract[tag]["CARBON_AG"] == pytest.approx(exp["CARBON_AG"], rel=REL)


# ---------------------------------------------------------------------------
# Bisection-arm anchors: rcumob (merch-height profile) and volob rows,
# transcribed from the published CSVs.  The merch height has no closed form
# (it is the root of the published diameter-profile equation), but the ROOT
# PROPERTY is checkable with published algebra alone: substituting the
# engine's HT4 back into the published profile must give back the 4-inch
# merchantability limit.  Sections volumes above the root ARE closed-form
# (findVol, R/predictCRM2.R:767-785), so VMERIB/VSTPIB anchor exactly once
# HT4 is certified.
RCUMOB = {  # rcumob_coefs.csv "SPCD DIVISION" -> (alpha, beta)
    131: (2.120196112478, 0.870729288379),   # "131 230"
    316: (2.509392320362, 0.909544424852),   # "316 M220"
    111: (2.031462229442, 0.829936344786),   # "111 230"
}
VOLOB = {  # volob_coefs.csv -> eq3 (a, b, c)
    131: (0.002585344478, 1.927334736454, 1.053005504332),  # "131 230"
    316: (0.003372461547, 1.909873966946, 0.975448469001),  # "316 M220"
    111: (0.003633228676, 1.952409264085, 0.965147963283),  # "111 230"
}
# rcumib rows already transcribed for HT_RAT_ADJ; reused for section volumes
RCUMIB = {
    131: (2.084027404329, 0.88992991865),
    316: (2.539226776257, 0.898401820199),
    111: (2.032340091912, 0.830535356908),
}

LIVE_TREES = [t for t in TREES if t[7] == 1]


@pytest.mark.parametrize("tree", LIVE_TREES, ids=[t[0] for t in LIVE_TREES])
def test_merch_height_satisfies_published_profile(estimated, tree):
    """Substitution anchor for the root find: the published diameter
    profile (reference ``findHT``'s objective, ``R/predictCRM2.R:737-751``)
    evaluated at the engine's HT4/HTSAW must return the published
    merchantability limits (4-inch top; 7-inch softwood / 9-inch hardwood
    sawlog top, ``R/predictCRM2.R:25``).  The bisection brackets the root
    within ``THT / 2^48``, so the residual must be far below the 1e-6
    asserted here — no builder-authored root finder is consulted."""
    _, full = estimated
    tag, spcd, D, tht = tree[0], tree[1], tree[2], tree[3]
    a, b, c = VOLOB[spcd]
    alpha, beta = RCUMOB[spcd]
    K = a * D**b * tht**c / 0.005454154 / tht * alpha * beta

    def profile_d(h: float) -> float:
        x = h / tht
        return math.sqrt(
            K * (1 - x) ** (alpha - 1) * (1 - (1 - x) ** alpha) ** (beta - 1)
        )

    ht4 = full[tag]["HT4"]
    assert ht4 is not None and 5.0 < ht4 < tht
    assert abs(profile_d(ht4) - 4.0) < 1e-6, f"{tag}: pd(HT4)={profile_d(ht4)}"

    saw_lim = 7.0 if SPECIES[spcd]["grp"] == "S" else 9.0
    htsaw = full[tag]["HTSAW"]
    assert htsaw is not None and 5.0 < htsaw < tht
    assert abs(profile_d(htsaw) - saw_lim) < 1e-6, f"{tag}: pd(HTSAW)"


@pytest.mark.parametrize("tree", LIVE_TREES, ids=[t[0] for t in LIVE_TREES])
def test_section_volumes_match_published_closed_form(estimated, tree):
    """With HT4 certified by the substitution anchor above, the merch and
    stump volumes are direct evaluations of the published cumulative-ratio
    profile (``findVol``: ``(1-(1-h/H)^alpha)^beta * VTOT`` differenced
    between heights, with the rcumib row; ``R/predictCRM2.R:94-162``
    fixes the bounds: merch = 1 ft stump to HT4, stump = 0 to 1 ft)."""
    _, full = estimated
    tag, spcd, D, tht = tree[0], tree[1], tree[2], tree[3]
    vib = SPECIES[spcd]["vib"](D, tht)
    al, be = RCUMIB[spcd]

    def r(h: float) -> float:
        return (1 - (1 - h / tht) ** al) ** be * vib

    ht4 = full[tag]["HT4"]
    assert full[tag]["VMERIB_GROSS"] == pytest.approx(r(ht4) - r(1.0), rel=REL)
    assert full[tag]["VSTPIB_GROSS"] == pytest.approx(r(1.0) - r(0.0), rel=REL)


def test_transcribed_deduction_rows_match_vendored_resources():
    """Spot-check the transcription against the vendored resource CSVs the
    engine loads (themselves verified against the reference's data-raw by
    tests/test_nsvb.py) — catches drift on either side."""
    import csv
    import os

    res = os.path.join(os.path.dirname(carbon.__file__), "..", "resources")

    def rows(path):
        with open(path) as f:
            return list(csv.DictReader(f))

    rcumib = {
        r["SPCD_DIVISION"]: r
        for r in rows(os.path.join(res, "coefs", "rcumib_coefs.csv"))
        if r.get("SPCD_DIVISION")
    }
    assert float(rcumib["131 230"]["alpha"]) == 2.084027404329
    assert float(rcumib["316 M220"]["beta"]) == 0.898401820199
    assert float(rcumib["111 230"]["alpha"]) == 2.032340091912

    rcumob = {
        r["SPCD_DIVISION"]: r
        for r in rows(os.path.join(res, "coefs", "rcumob_coefs.csv"))
        if r.get("SPCD_DIVISION")
    }
    assert float(rcumob["131 230"]["alpha"]) == 2.120196112478
    assert float(rcumob["316 M220"]["beta"]) == 0.909544424852
    assert float(rcumob["111 230"]["alpha"]) == 2.031462229442

    volob = {
        r["SPCD_DIVISION"]: r
        for r in rows(os.path.join(res, "coefs", "volob_coefs.csv"))
        if r.get("SPCD_DIVISION")
    }
    assert float(volob["131 230"]["a"]) == 0.002585344478
    assert float(volob["316 M220"]["b"]) == 1.909873966946
    assert float(volob["111 230"]["c"]) == 0.965147963283

    bark = {
        r["SPCD_DIVISION"]: r
        for r in rows(os.path.join(res, "coefs", "bark_biomass_coefs.csv"))
        if r.get("SPCD_DIVISION")
    }
    assert float(bark["131 230"]["b2"]) == -0.03493278539
    assert float(bark["316 M220"]["a"]) == 0.02544808104

    branch = {
        r["SPCD_DIVISION"]: r
        for r in rows(os.path.join(res, "coefs", "branch_biomass_coefs.csv"))
        if r.get("SPCD_DIVISION")
    }
    assert float(branch["111 230"]["b"]) == 3.748201042703

    decay = {
        (r["SFTWD_HRDWD"], r["DECAYCD"]): r
        for r in rows(os.path.join(res, "REF_TREE_DECAY_PROP.csv"))
    }
    assert float(decay[("S", "3")]["DENSITY_PROP"]) == 0.92
    assert float(decay[("H", "2")]["BARK_LOSS_PROP"]) == 0.8
    assert float(decay[("S", "4")]["BRANCH_LOSS_PROP"]) == 0.0

    dead = {
        (r["SFTWD_HRDWD"], r["DECAYCD"]): r
        for r in rows(os.path.join(res, "REF_TREE_CARBON_RATIO_DEAD.csv"))
    }
    assert float(dead[("S", "4")]["CARBON_RATIO"]) == 0.52
    assert float(dead[("H", "2")]["CARBON_RATIO"]) == 0.473
