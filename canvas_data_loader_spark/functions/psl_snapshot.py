"""Public-suffix-list SNAPSHOT for registrable-domain extraction.

A vendored subset of the Mozilla Public Suffix List (publicsuffix.org
— public data, MPL-2.0; list contents are factual registry policy),
restricted to MULTI-LABEL suffixes: the last-two-labels heuristic in
``functions/urls.py`` is already correct whenever the public suffix is
a single label (``example.org`` -> ``example.org``), so only rules
like ``co.uk`` (registrable = ``example.co.uk``) need a table.
Snapshot taken 2026-08 by hand from the ICANN section's most common
ccTLD second-level registries; a production deployment swaps this
tuple for the full list file (same shape: one suffix string per
entry). Wildcard (``*.ck``) and exception (``!www.ck``) rules are NOT
represented — hosts under them fall back to the heuristic — and that
limitation is documented at the call sites.

Both the Spark expression and the DuckDB SQL mirror read these SAME
tuples, so the two engines cannot disagree about what is a suffix.
"""

from __future__ import annotations

# 2-label public suffixes: registrable domain = last THREE labels.
PSL_SUFFIXES_2 = (
    # .uk
    "co.uk", "org.uk", "me.uk", "net.uk", "ac.uk", "gov.uk", "sch.uk",
    "plc.uk", "ltd.uk",
    # .jp
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    # .au
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    # .nz
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "maori.nz", "iwi.nz",
    # .br
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br",
    # .cn
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    # .in
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in",
    # .za
    "co.za", "org.za", "web.za", "net.za", "gov.za", "ac.za",
    # .kr
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    # .il
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    # .th
    "co.th", "or.th", "ac.th", "go.th", "net.th", "in.th",
    # assorted frequent ccTLD registries
    "com.ar", "com.mx", "com.tr", "com.tw", "com.sg", "com.hk",
    "com.my", "com.ph", "com.vn", "com.eg", "com.sa", "com.pk",
    "com.bd", "com.ua", "in.ua", "com.pl", "com.co", "com.pe",
    "com.ve", "com.uy", "com.ec", "com.do", "com.gt", "com.ng",
    "com.gh", "com.ke", "co.ke", "or.ke", "com.et", "com.np",
    "com.kh", "com.lb", "com.jo", "com.kw", "com.qa", "com.om",
    "com.bh", "net.ru",  # (com.ru/net.ru are legacy but still listed)
)

# 3-label public suffixes: registrable domain = last FOUR labels.
PSL_SUFFIXES_3 = (
    "act.edu.au", "nsw.edu.au", "nt.edu.au", "qld.edu.au",
    "sa.edu.au", "tas.edu.au", "vic.edu.au", "wa.edu.au",
    "act.gov.au", "nsw.gov.au", "nt.gov.au", "qld.gov.au",
    "sa.gov.au", "tas.gov.au", "vic.gov.au", "wa.gov.au",
)
