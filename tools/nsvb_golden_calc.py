"""Independent NSVB golden-value calculator (provenance tool for
``tests/test_nsvb_golden.py``).

This is a deliberately SEPARATE, scalar, pure-Python re-derivation of the
published NSVB / CRM2 estimation chain, written directly from the reference
R sources (``R/predictCRM2.R``, ``R/prep_carbon.R``, ``R/estimate_carbon.R``,
``R/getDivision.R`` — themselves the published Walker CRM2 application code)
and the published coefficient CSVs in ``foresttime_builder_spark/resources``.
It intentionally shares NO code with ``functions/nsvb.py`` / ``plans/
carbon.py`` (different structure: per-tree scalars + root-finding here vs a
columnar DAG + fixed-iteration bisection there), so a transcription slip in
the engine's DAG — or in its DuckDB oracle twin, which the engine's
correctness gate is generated alongside — cannot silently reproduce here.

The design follows the reference's own strongest test
(``tests/testthat/test-estimate_carbon.R:2-57``), which compares
``DRYBIO_AG``/``CARBON_AG`` against externally published FIADB values at
1e-3 relative tolerance.  FIADB itself is not available offline, so the
external anchor is this independent evaluation of the published equations;
values produced here are committed as LITERALS in the pytest (rerunning
this script is provenance, not part of the test).

Run:  python tools/nsvb_golden_calc.py
"""

from __future__ import annotations

import csv
import math
import os

RES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "foresttime_builder_spark",
    "resources",
)

LB_PER_FT3 = 62.4


def _num(s: str):
    if s in ("NA", "", None):
        return None
    try:
        return float(s)
    except ValueError:
        return s


def _load_coefs(name: str) -> list[dict]:
    with open(os.path.join(RES, "coefs", f"{name}_coefs.csv"), newline="") as f:
        rows = []
        for r in csv.DictReader(f):
            rows.append({k: _num(v) for k, v in r.items()})
        return rows


COEFS = {
    n: _load_coefs(n)
    for n in (
        "volib",
        "volbk",
        "volob",
        "rcumib",
        "rcumob",
        "total_biomass",
        "bark_biomass",
        "branch_biomass",
        "foliage",
    )
}


def _load_csv(name: str) -> list[dict]:
    with open(os.path.join(RES, name), newline="", encoding="utf-8-sig") as f:
        return [{k: _num(v) for k, v in r.items()} for r in csv.DictReader(f)]


REF_SPECIES = _load_csv("REF_SPECIES.csv")
DECAY_PROP = _load_csv("REF_TREE_DECAY_PROP.csv")
CARBON_DEAD = _load_csv("REF_TREE_CARBON_RATIO_DEAD.csv")
CRPROP = _load_csv("median_crprop.csv")

LEVELS = ("SPCD_DIVISION", "SPCD", "JENKINS_SPGRPCD")


def get_division(ecosubcd: str, prov: bool = False) -> str:
    """R/getDivision.R:7-33."""
    x = ecosubcd.strip()
    if len(x) == 0:
        y = ""
    elif len(x) == 4:
        y = x[:3]
    elif len(x) == 7:
        y = x[:-3]
    else:
        y = x[:-2]
    if prov:
        return y
    return y[:-1] + "0" if y else ""


def _level_key(tree: dict, level: str):
    if level == "SPCD_DIVISION":
        return f"{tree['SPCD_CHR']} {tree['DIVISION']}"
    if level == "SPCD":
        return tree["SPCD_CHR"]
    return float(tree["JENKINS_SPGRPCD"])


def _rows_at(table: list[dict], level: str, key):
    out = []
    for r in table:
        v = r.get(level)
        if v is None:
            continue
        if level == "JENKINS_SPGRPCD":
            if float(v) == key:
                out.append(r)
        elif str(v) == str(key) or (
            isinstance(v, float) and v == int(v) and str(int(v)) == str(key)
        ):
            out.append(r)
    return out


def resolve(tree: dict, *tables: str):
    """combineLevels2 precedence (R/predictCRM2.R:714-721): first level, in
    SPCD_DIVISION > SPCD > JENKINS order, at which EVERY listed coef table
    has a row (applyAllLevels inner-merges the tables per level,
    R/predictCRM2.R:656-668)."""
    for level in LEVELS:
        key = _level_key(tree, level)
        merged: dict = {}
        ok = True
        for t in tables:
            rows = _rows_at(COEFS[t], level, key)
            if not rows:
                ok = False
                break
            assert len(rows) == 1, (t, level, key)
            merged.update({k: v for k, v in rows[0].items() if v is not None})
        if ok:
            merged["_level"] = level
            return merged
    return None


def apply_form(eq: float, co: dict, dbh: float, tht: float, k: float, wdsg: float):
    """equation_forms_and_calls.csv rhs + the two appended forms
    (R/estimate_carbon.R:64-72)."""
    if eq == 3:
        return co["a"] * dbh ** co["b"] * tht ** co["c"]
    if eq == 4:
        if dbh < k:
            return co["a0"] * dbh ** co["b0"] * tht ** co["c"]
        return co["a0"] * k ** (co["b0"] - co["b1"]) * dbh ** co["b1"] * tht ** co["c"]
    if eq == 5:
        return (
            co["a"]
            * dbh ** (co["a1"] * (1 - math.exp(-co["b1"] * dbh)) ** co["c1"])
            * tht ** co["c"]
        )
    if eq == 50:
        return co["a"] * dbh ** co["b"] * tht ** co["c"] * math.exp(-(co["b2"] * dbh))
    if eq == 3.1:
        return co["a"] * dbh ** co["b"] * tht ** co["c"] * wdsg
    raise ValueError(f"unknown equation {eq}")


def find_ht(dbh, tht, dlim, alpha, beta, a, b, c):
    """R/predictCRM2.R:729-765 — height where stem (outside-bark) diameter
    tapers to ``dlim``.  The reference minimizes |pd - d| with stats::
    optimise; pd(h) is strictly decreasing from +inf (h→0) to 0 (h→H), so
    the minimizer is the root of pd(h) = d — found here by bisection to
    machine precision (an independent method; agreement is analytic, not
    numerical coincidence)."""
    if dbh is None or dbh < 5.0:
        return None

    def pd(h):
        t = 1 - h / tht
        return math.sqrt(
            a
            * dbh**b
            * tht**c
            / 0.005454154
            / tht
            * alpha
            * beta
            * t ** (alpha - 1)
            * (1 - t**alpha) ** (beta - 1)
        )

    lo, hi = 1e-12 * tht, tht * (1 - 1e-15)
    if pd(lo) < dlim:
        return 0.0  # base already thinner than the limit: minimum at h = 0
    for _ in range(200):
        mid = (lo + hi) / 2
        if pd(mid) > dlim:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2


def find_vol(hl, hu, tht, alpha, beta, vol):
    """R/predictCRM2.R:767-785: volume between stem heights hl and hu."""
    if hu is None or vol is None:
        return None
    vl = (1 - (1 - hl / tht) ** alpha) ** beta * vol
    vu = (1 - (1 - hu / tht) ** alpha) ** beta * vol
    return vu - vl


def _species(spcd: int) -> dict:
    for r in REF_SPECIES:
        if int(r["SPCD"]) == spcd:
            return r
    raise KeyError(spcd)


def _decay(sftwd_hrdwd: str, decaycd: int) -> dict:
    for r in DECAY_PROP:
        if r["SFTWD_HRDWD"] == sftwd_hrdwd and int(r["DECAYCD"]) == decaycd:
            return r
    raise KeyError((sftwd_hrdwd, decaycd))


def _carbon_dead(sftwd_hrdwd: str, decaycd: int) -> float:
    for r in CARBON_DEAD:
        if r["SFTWD_HRDWD"] == sftwd_hrdwd and int(r["DECAYCD"]) == decaycd:
            return r["CARBON_RATIO"]
    raise KeyError((sftwd_hrdwd, decaycd))


def _crmn(province: str, sftwd_hrdwd: str) -> float:
    # med_cr_prop: SFTWD_HRDWD = 'S' iff hwd_yn == 'N' (R/estimate_carbon.R:11-13)
    for r in CRPROP:
        sh = "S" if r["hwd_yn"] == "N" else "H"
        if str(r["Province"]) == province and sh == sftwd_hrdwd:
            return r["CRmn"]
    # UNDEFINED fallback (R/estimate_carbon.R:24-36)
    for r in CRPROP:
        sh = "S" if r["hwd_yn"] == "N" else "H"
        if r["Province"] == "UNDEFINED" and sh == sftwd_hrdwd:
            return r["CRmn"]
    raise KeyError((province, sftwd_hrdwd))


def estimate(tree: dict) -> dict:
    """prep_carbon → estimate_carbon → predictCRM2 for one tree.

    Input keys: SPCD, DIA, HT, ACTUALHT, CR, CULL, STATUSCD,
    STANDING_DEAD_CD, DECAYCD, STDORGCD, ECOSUBCD.
    Returns DRYBIO_AG / CARBON_AG (None when the reference filters the tree
    out: JENKINS_SPGRPCD >= 10 or missing HT, R/estimate_carbon.R:18) plus
    checkable intermediates.
    """
    t = dict(tree)
    sp = _species(t["SPCD"])
    jenkins = sp["JENKINS_SPGRPCD"]
    sftwd = sp["SFTWD_HRDWD"]
    wdsg = sp["WOOD_SPGR_GREENVOL_DRYWT"]

    # ---- prep_carbon (R/prep_carbon.R:38-90)
    live = t["STATUSCD"] == 1
    cull_decay_ratio = _decay(sftwd, 3)["DENSITY_PROP"] if live else 1.0
    if live:
        sdcd, decaycd = 0, 0
        decay_wd = decay_bk = decay_br = 1.0
        c_frac = sp["CARBON_RATIO_LIVE"] * 100
    else:
        sdcd = t["STANDING_DEAD_CD"]
        decaycd = t["DECAYCD"]
        d = _decay(sftwd, int(decaycd))
        decay_wd, decay_bk, decay_br = (
            d["DENSITY_PROP"],
            d["BARK_LOSS_PROP"],
            d["BRANCH_LOSS_PROP"],
        )
        c_frac = _carbon_dead(sftwd, int(decaycd)) * 100
    province = get_division(t["ECOSUBCD"], prov=True)
    division = get_division(t["ECOSUBCD"])
    cull = t["CULL"] if t["CULL"] is not None else 0.0

    # ---- estimate_carbon eligibility + mutations (R/estimate_carbon.R:17-57)
    if jenkins >= 10 or t["HT"] is None:
        return {"DRYBIO_AG": None, "CARBON_AG": None}
    crmn = _crmn(province, sftwd)
    tht, aht = float(t["HT"]), float(t["ACTUALHT"])
    broken_top = tht != aht
    cr = t["CR"]
    if cr is None and live:
        cr = 0.0
    stdorgcd = t["STDORGCD"] if t["STDORGCD"] is not None else 0
    spcd_chr = (
        f"1_{t['SPCD']}" if t["SPCD"] in (111, 131) and stdorgcd == 1 else str(t["SPCD"])
    )
    t.update(SPCD_CHR=spcd_chr, DIVISION=division, JENKINS_SPGRPCD=jenkins)

    dbh = float(t["DIA"])
    spcd_numeric = t["SPCD"]
    k = 9.0 if spcd_numeric < 300 else 11.0
    saw = 7.0 if spcd_numeric < 300 else 9.0

    # ---- predictCRM2 volumes (R/predictCRM2.R:41-170)
    co = resolve(t, "volib")
    vtotib = apply_form(co["equation"], co, dbh, tht, k, wdsg)
    co = resolve(t, "volbk")
    vtotbk = apply_form(co["equation"], co, dbh, tht, k, wdsg)
    vtotob = vtotib + vtotbk

    htco = resolve(t, "rcumob", "volob")  # alpha/beta + a/b/c merged per level
    ht4 = find_ht(dbh, tht, 4.0, htco["alpha"], htco["beta"], htco["a"], htco["b"], htco["c"])
    ht4 = max(ht4, 5.0) if ht4 is not None else None

    rib = resolve(t, "rcumib")
    vmerib = find_vol(1.0, ht4, tht, rib["alpha"], rib["beta"], vtotib)
    vmerob = find_vol(1.0, ht4, tht, rib["alpha"], rib["beta"], vtotob)
    vstpib = find_vol(0.0, 1.0, tht, rib["alpha"], rib["beta"], vtotib)
    vstpob = find_vol(0.0, 1.0, tht, rib["alpha"], rib["beta"], vtotob)
    if dbh < 5.0:
        vstpib = vstpob = None  # R/predictCRM2.R:162
    vstpbk = (vstpob - vstpib) if vstpib is not None else None
    vmerbk = (vmerob - vmerib) if vmerib is not None else None

    htsaw = find_ht(
        dbh, tht, saw, htco["alpha"], htco["beta"], htco["a"], htco["b"], htco["c"]
    )
    htsaw = max(htsaw, 5.0) if htsaw is not None else None

    # ---- broken-top / present volumes (R/predictCRM2.R:227-288)
    adj = resolve(t, "rcumib")
    ht_rat_adj = (
        (1 - (1 - aht / tht) ** adj["alpha"]) ** adj["beta"] if aht < tht else 1.0
    )
    vtotib_present = vtotib * ht_rat_adj
    vtotbk_present = vtotbk * ht_rat_adj
    if vmerib is not None and ht4 is not None and aht < ht4:
        vmerib_present = vtotib * ht_rat_adj - vstpib
        vmerbk_present = vtotbk * ht_rat_adj - vstpbk
    else:
        vmerib_present, vmerbk_present = vmerib, vmerbk

    snd_wood_decay = (1 - cull / 100) if cull < 99 else 0.0
    vtotib_sound = vtotib_present * snd_wood_decay
    vmerib_sound = (
        vmerib_present * snd_wood_decay if vmerib_present is not None else None
    )
    vtotbk_sound = vtotbk_present * decay_bk

    # ---- biomass components (R/predictCRM2.R:355-417)
    co = resolve(t, "total_biomass")
    eq = 3.1 if co["_level"] == "JENKINS_SPGRPCD" else co["equation"]
    total = apply_form(eq, co, dbh, tht, k, wdsg)
    co = resolve(t, "bark_biomass")
    bark = apply_form(co["equation"], co, dbh, tht, k, wdsg)
    co = resolve(t, "branch_biomass")
    eq = 3.1 if co["_level"] == "JENKINS_SPGRPCD" else co["equation"]
    branch = apply_form(eq, co, dbh, tht, k, wdsg)

    wood = vtotib * wdsg * LB_PER_FT3

    # ---- reductions (R/predictCRM2.R:425-479)
    cull_reduction = (
        1 - (1 - cull_decay_ratio) * cull / 100 if sdcd < 1 else 1.0
    )
    wood_reduction = ht_rat_adj * cull_reduction * decay_wd
    bark_reduction = ht_rat_adj * decay_bk * decay_wd

    cr_eff = max(cr, 1.0) if cr is not None else None
    crprop_ht = (
        1 - aht / tht * (1 - cr_eff / 100) if cr_eff is not None else None
    )
    if sdcd == 1:
        crprop_ht = crmn / 100
    if crprop_ht is not None:
        bcp = max((aht - (1 - crprop_ht) * tht) / (crprop_ht * tht), 0.0)
        if bcp < 0.01:
            bcp = 0.0
    else:
        bcp = None
    if not broken_top:
        bcp = 1.0
    branch_reduction = bcp * decay_br * decay_wd

    wood_r = wood * wood_reduction
    bark_r = bark * bark_reduction
    branch_r = branch * branch_reduction
    agb_reduction = (wood_r + bark_r + branch_r) / (wood + bark + branch)
    biomass = total * agb_reduction
    carbon = biomass * c_frac / 100

    return {
        "DRYBIO_AG": biomass,
        "CARBON_AG": carbon,
        "VTOTIB_GROSS": vtotib,
        "VTOTBK_GROSS": vtotbk,
        "HT4": ht4,
        "HTSAW": htsaw,
        "VMERIB_SOUND": vmerib_sound,
        "VTOTIB_SOUND": vtotib_sound,
        "VTOTBK_SOUND": vtotbk_sound,
        "Total": total,
        "Bark": bark,
        "Branch": branch,
        "HT_RAT_ADJ": ht_rat_adj,
    }


#: Golden trees: realistic FIA measurements chosen to cover every resolution
#: level, equation form, and deduction path (see tests/test_nsvb_golden.py).
GOLDEN_TREES = [
    dict(tag="t01_loblolly_live_sd", SPCD=131, DIA=11.3, HT=72.0, ACTUALHT=72.0, CR=40.0,
         CULL=0.0, STATUSCD=1, STANDING_DEAD_CD=None, DECAYCD=None, STDORGCD=0,
         ECOSUBCD="232Ce"),
    dict(tag="t02_loblolly_planted", SPCD=131, DIA=9.8, HT=61.0, ACTUALHT=61.0, CR=35.0,
         CULL=2.0, STATUSCD=1, STANDING_DEAD_CD=None, DECAYCD=None, STDORGCD=1,
         ECOSUBCD="232Ce"),
    dict(tag="t03_loblolly_spcd_fallback", SPCD=131, DIA=14.1, HT=85.0, ACTUALHT=85.0,
         CR=45.0, CULL=0.0, STATUSCD=1, STANDING_DEAD_CD=None, DECAYCD=None,
         STDORGCD=0, ECOSUBCD="255Ab"),  # division 250: not in 131's SD keys
    dict(tag="t04_redmaple_live_sd", SPCD=316, DIA=13.4, HT=68.0, ACTUALHT=68.0, CR=55.0,
         CULL=5.0, STATUSCD=1, STANDING_DEAD_CD=None, DECAYCD=None, STDORGCD=0,
         ECOSUBCD="M221Dc"),  # province M221 -> division M220 (in 316's SD keys)
    dict(tag="t05_redmaple_broken_top", SPCD=316, DIA=16.0, HT=65.0, ACTUALHT=40.0,
         CR=30.0, CULL=0.0, STATUSCD=1, STANDING_DEAD_CD=None, DECAYCD=None,
         STDORGCD=0, ECOSUBCD="221Ha"),
    dict(tag="t06_redmaple_broken_cull", SPCD=316, DIA=20.2, HT=70.0, ACTUALHT=18.0,
         CR=20.0, CULL=85.0, STATUSCD=1, STANDING_DEAD_CD=None, DECAYCD=None,
         STDORGCD=0, ECOSUBCD="231Aa"),
    dict(tag="t07_loblolly_sapling", SPCD=131, DIA=3.2, HT=21.0, ACTUALHT=21.0, CR=60.0,
         CULL=0.0, STATUSCD=1, STANDING_DEAD_CD=None, DECAYCD=None, STDORGCD=0,
         ECOSUBCD="232Ce"),
    dict(tag="t08_redmaple_standing_dead", SPCD=316, DIA=12.7, HT=62.0, ACTUALHT=45.0,
         CR=None, CULL=0.0, STATUSCD=2, STANDING_DEAD_CD=1, DECAYCD=3, STDORGCD=0,
         ECOSUBCD="M221Dc"),
    dict(tag="t09_loblolly_dead_intact", SPCD=131, DIA=10.5, HT=66.0, ACTUALHT=66.0,
         CR=25.0, CULL=0.0, STATUSCD=2, STANDING_DEAD_CD=1, DECAYCD=2, STDORGCD=0,
         ECOSUBCD="232Ce"),
    dict(tag="t10_osageorange_jenkins_only", SPCD=6135, DIA=8.3, HT=38.0, ACTUALHT=38.0,
         CR=48.0, CULL=0.0, STATUSCD=1, STANDING_DEAD_CD=None, DECAYCD=None,
         STDORGCD=0, ECOSUBCD="255Ab"),  # no SPCD/SD coefs: JENKINS + eq 3.1
    dict(tag="t11_whitecedar_mixed_levels", SPCD=68, DIA=9.1, HT=42.0, ACTUALHT=42.0,
         CR=50.0, CULL=0.0, STATUSCD=1, STANDING_DEAD_CD=None, DECAYCD=None,
         STDORGCD=0, ECOSUBCD="232Ce"),  # volumes at SD, biomass at JENKINS
    dict(tag="t12_mtnmahogany_woodland_null", SPCD=475, DIA=6.0, HT=15.0, ACTUALHT=15.0,
         CR=40.0, CULL=0.0, STATUSCD=1, STANDING_DEAD_CD=None, DECAYCD=None,
         STDORGCD=0, ECOSUBCD="341Fb"),  # JENKINS 10: reference filters out
    dict(tag="t13_missing_height_null", SPCD=316, DIA=10.0, HT=None, ACTUALHT=None,
         CR=30.0, CULL=0.0, STATUSCD=1, STANDING_DEAD_CD=None, DECAYCD=None,
         STDORGCD=0, ECOSUBCD="221Ha"),
    dict(tag="t14_slash_eq50", SPCD=111, DIA=12.4, HT=78.0, ACTUALHT=78.0, CR=38.0,
         CULL=1.0, STATUSCD=1, STANDING_DEAD_CD=None, DECAYCD=None, STDORGCD=0,
         ECOSUBCD="232Bg"),
    dict(tag="t15_slash_planted", SPCD=111, DIA=7.6, HT=52.0, ACTUALHT=52.0, CR=33.0,
         CULL=0.0, STATUSCD=1, STANDING_DEAD_CD=None, DECAYCD=None, STDORGCD=1,
         ECOSUBCD="232Bg"),
    dict(tag="t16_dead_undefined_province", SPCD=316, DIA=11.8, HT=55.0, ACTUALHT=31.0,
         CR=None, CULL=0.0, STATUSCD=2, STANDING_DEAD_CD=1, DECAYCD=4, STDORGCD=0,
         ECOSUBCD=""),  # CRmn falls back to the UNDEFINED rows
    dict(tag="t17_cr_zero_cull_100", SPCD=316, DIA=15.3, HT=60.0, ACTUALHT=60.0, CR=0.0,
         CULL=100.0, STATUSCD=1, STANDING_DEAD_CD=None, DECAYCD=None, STDORGCD=0,
         ECOSUBCD="231Aa"),
    dict(tag="t18_dead_decay5", SPCD=131, DIA=13.0, HT=58.0, ACTUALHT=20.0, CR=None,
         CULL=0.0, STATUSCD=2, STANDING_DEAD_CD=1, DECAYCD=5, STDORGCD=0,
         ECOSUBCD="232Ce"),
    dict(tag="t19_cr_missing_live", SPCD=131, DIA=8.9, HT=55.0, ACTUALHT=55.0, CR=None,
         CULL=0.0, STATUSCD=1, STANDING_DEAD_CD=None, DECAYCD=None, STDORGCD=0,
         ECOSUBCD="232Ce"),
    dict(tag="t20_hardwood_sapling", SPCD=316, DIA=2.1, HT=16.0, ACTUALHT=16.0, CR=65.0,
         CULL=0.0, STATUSCD=1, STANDING_DEAD_CD=None, DECAYCD=None, STDORGCD=0,
         ECOSUBCD="M221Dc"),
]


def main() -> None:
    for tree in GOLDEN_TREES:
        est = estimate({k: v for k, v in tree.items() if k != "tag"})
        vals = {
            k: (round(v, 6) if isinstance(v, float) else v) for k, v in est.items()
        }
        print(f'("{tree["tag"]}", {vals!r}),')


if __name__ == "__main__":
    main()
