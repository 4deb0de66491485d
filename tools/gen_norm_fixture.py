#!/usr/bin/env python3
"""Differential-test fixture generator (dev tool).

Imports the reference pipeline's pure normalization functions (its main is
__name__-guarded) and records input→output pairs for a corpus of tricky
strings. The resulting JSON is consumed by NormalizeDiffSpec, which asserts
the engine's JVM kernels agree byte-for-byte. No reference code is copied —
only behavior is captured as data.

Usage: python3 tools/gen_norm_fixture.py > src/test/resources/norm_fixture.json
"""
import importlib.util
import json
import sys

spec = importlib.util.spec_from_file_location(
    "refpipe", "/root/reference/src/barrazueta_pipeline_etl_crossref.py")
ref = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ref)

CASES = [
    "", " ", "plain ascii", "  collapse   me  ",
    "a\tb\nc\r\nd", " nbsp padded ",
    "Ávila &amp; Co", "José Pérez",  # decomposed é vs composed
    "&lt;tag&gt; &quot;q&quot; &#65; &#x42; &apos;",
    "&#X42; &#Xe9; &#X2013;",  # uppercase-hex numeric entities
    "&ntilde;o&ntilde;o", "&unknown; &amp;amp;",
    "ESPAÑA Straße Müller ﬁancée",  # ñ, ß, ligature fi (NFKD expands)
    "ＦＵＬＬＷＩＤＴＨ ｔｅｘｔ",  # NFKD folds fullwidth
    "中文 text mixed 日本語",
    "Universidad Politécnica  SALESIANA,  Cuenca",
    "ÅHÉJ ÖLJY i̇stanbul",
    "é́ double-combining",
    "ROMAN Ⅻ numeral",  # NFKD expands to XII
    "¼ fraction ½",
    "https://doi.org/10.1234/ABC.DEF",
    "HTTP://DX.DOI.ORG/10.1/X",
    "doi: 10.5/Y", "DOI:10.6/Z", "  10.7/W  ", "not a doi",
    "https://doi.org/10.1000/j.x&amp;y",
    "doi:  10.8/spaced",
]

CASES += [
    # final-sigma context battery (CPython vs JVM rule divergence)
    "ΑΣ", "ΑΣ0", "ΑΣ0τε", "Σ", "ΣΑ", "Α.Σ.", "O'Σ", "ΑΣ'τ", "ΑΣ τ",
    "Σ0", "0Σ", "ΑΣ·τ", "ΑΣ:τ", "ΑΣ,τ", "x́Σ", "Σ́x",
]

# seeded random corpus over an adversarial alphabet (entities, combining
# marks, unicode spaces, fullwidth, CJK, controls)
import random
rng = random.Random(42)
ALPHABET = (list("abcXYZ09 .,-_/") +
            ["&amp;", "&lt;", "&#65;", "&#x42;", "&nbsp;", "&bogus;",
             "é", "é", "ñ", "ß", "ﬁ", "Ⅻ", "¼", "中", "文",
             " ", " ", "　", "\t", "\n", "́", "̃",
             "Ｆ", "ｔ", "İ", "ı", "Σ", "σ", "ς"])
ALPHABET += ["Σ", "Α", "τ", "ά"]
# ccc=0 marks (must SURVIVE the combining strip: unicodedata.combining=0
# even though they are \p{M}) and nonzero-ccc marks beyond Latin
ALPHABET += ["ँ", "ि", "া",   # candrabindu + matras, ccc=0
             "्",                        # devanagari virama, ccc=9
             "ָ", "ً",              # hebrew/arabic points, ccc>0
             "ุ", "゙",              # thai sara u, kana voicing
             "क", "ह", "ก", "א", "ب"]        # base letters for the marks
for _ in range(800):
    CASES.append("".join(rng.choice(ALPHABET)
                         for _ in range(rng.randint(0, 24))))

out = []
for s in CASES:
    out.append({
        "input": s,
        "nfc": ref.norm_text_nfc(s),
        "key": ref.norm_text_nfkd_lower(s),
        "doi": ref.standardize_doi(s),
    })

# country detection cases
COUNTRY_CASES = [
    "Universidad Politécnica Salesiana, Cuenca, Ecuador",
    "University of California, U.S.A.",
    "MIT, United States", "Oxford, UK", "Sorbonne, France",
    "TU München, Germany", "Universidad de Madrid, España",
    "Universidad de Madrid, Spain", "PUCP, Perú", "PUCP, Peru",
    "Tsinghua, China", "Tokyo University, Japan", "No country here",
    "Univ do Brasil", "Canadá proper", "canada lower",
    # mixed-script word boundaries: Python \b is Unicode-aware, so a
    # pattern glued to CJK/Thai letters must NOT match
    "北京china研究所", "中国 china 大学", "chinaการศึกษา",
    "ukไทย", "เมืองuk", "日本japan東京", "多伦多canada研究院",
]
countries = []
for s in COUNTRY_CASES:
    cc, name = ref.guess_country_from_text(s)
    countries.append({"input": s, "cc": cc, "name": name})

# date extraction cases (C4/C5): priority fallthrough, falsy years,
# window bounds, short date-parts, garbage month/day
DATE_CASES = [
    {},
    {"issued": {}},
    {"issued": {"date-parts": []}},
    {"issued": {"date-parts": [[]]}},
    {"issued": {"date-parts": [[None]]}},
    {"issued": {"date-parts": [[0]]}},
    {"issued": {"date-parts": [[2023]]}},
    {"issued": {"date-parts": [[2023, 7]]}},
    {"issued": {"date-parts": [[2023, 7, 15]]}},
    {"issued": {"date-parts": [[1599, 1, 1]]},
     "created": {"date-parts": [[1600, 2, 3]]}},
    {"published-online": {"date-parts": [[2101]]},
     "published-print": {"date-parts": [[2100, 12, 31]]}},
    {"published-online": {"date-parts": [[2020, 1, 2]]},
     "issued": {"date-parts": [[2019, 3]]}},
    {"created": {"date-parts": [[1995]]}},
    {"issued": {"date-parts": [[2024, 2, 29]]}},   # leap day, valid
    {"issued": {"date-parts": [[2023, 2, 29]]}},   # Feb 29 non-leap
    {"issued": {"date-parts": [[2023, 0, 5]]}},    # month 0
    {"issued": {"date-parts": [[2023, 13, 1]]}},   # month 13
    {"issued": {"date-parts": [[2023, 4, 31]]}},   # April 31
    # first valid-year key wins even with garbage m/d; later valid
    # keys must NOT be consulted
    {"published-online": {"date-parts": [[2022, 0, 1]]},
     "issued": {"date-parts": [[2018, 5, 6]]}},
    {"published-online": {"date-parts": [[15, 1, 1]]},
     "issued": {"date-parts": [[2018, 5, 6]]}},
]
dates = [{"msg": json.dumps(c), "year": ref.extract_year_any(c),
          "iso": ref.extract_date_iso(c)} for c in DATE_CASES]

# author display-name cases (C6)
AUTHOR_CASES = [
    {"given": "José", "family": "Pérez"},
    {"given": "", "family": "Smith"},
    {"given": None, "family": "Smith"},
    {"family": "Solo"},
    {"given": "Only"},
    {"name": "Collaboration XYZ"},
    {"given": "", "family": "", "name": "  ATLAS Team  "},
    {},
    {"given": "  J.  ", "family": "  Smith "},
    {"given": "Ana&amp;María", "family": "Ñáñez"},
    {"name": "ＦＵＬＬ Ｗidth"},
    {"given": "A", "family": "B", "name": "ignored"},
    {"given": None, "family": None, "name": None},
]
authors = [{"given": a.get("given"), "family": a.get("family"),
            "name": a.get("name"), "out": ref.author_full_name(a)}
           for a in AUTHOR_CASES]

json.dump({"norm": out, "country": countries, "dates": dates,
           "authors": authors}, sys.stdout,
          ensure_ascii=False, indent=1)
