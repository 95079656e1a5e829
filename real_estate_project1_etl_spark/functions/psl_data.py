"""Vendored representative subset of the Public Suffix List.

Source of truth: publicsuffix.org/list (public knowledge; the list is
maintained by Mozilla under the MPL). This module vendors a ~280-rule
REPRESENTATIVE subset covering every structural rule class the published
algorithm defines, so :func:`..web.registrable_domain_psl` is exercised
well beyond the 15-rule test sample:

- plain single-label TLDs and multi-part second-level registries
  (``co.uk``, ``com.au``, ``co.jp`` …),
- wildcard rules, both whole-TLD (``*.ck``, ``*.bd``) and nested
  geographic (``*.kawasaki.jp``),
- exception rules, including nested ones (``!www.ck``,
  ``!city.kawasaki.jp``),
- PRIVATE-section multi-level wildcards (``*.compute.amazonaws.com``)
  and platform suffixes (``github.io``, ``blogspot.com`` …).

At production scale the FULL list (~9k rules) ships the same way — a
one-column table broadcast onto the distinct-host set; nothing in the
operator depends on rule count. This subset exists so tests and the
oracle fixture stay reviewable while covering the same shapes.
"""

from __future__ import annotations

# fmt: off
DEFAULT_PSL_RULES: tuple[str, ...] = (
    # ---- generic TLDs ----
    "com", "org", "net", "edu", "gov", "int", "mil", "info", "biz",
    "name", "pro", "mobi", "travel", "museum", "aero", "coop", "jobs",
    "app", "dev", "io", "co", "ai", "me", "tv", "cc", "ws", "xyz",
    "online", "site", "store", "tech", "cloud", "blog", "wiki", "news",
    # ---- ccTLDs with flat registration ----
    "de", "fr", "nl", "be", "ch", "at", "cz", "sk", "pl", "hu", "ro",
    "bg", "hr", "si", "lt", "lv", "ee", "fi", "se", "no", "dk", "is",
    "ie", "pt", "es", "it", "gr", "ru", "by", "kz", "us", "ca", "mx",
    "cl", "pe", "ve", "ec", "eu", "li", "lu", "mc", "md", "me", "al",
    "ba", "rs", "mk", "cn", "jp", "kr", "tw", "hk", "sg", "my", "th",
    "vn", "ph", "id", "in", "pk", "lk", "ir", "iq", "sa", "ae", "il",
    "tr", "eg", "ma", "tn", "ng", "gh", "ke", "tz", "ug", "zm", "zw",
    "uk", "au", "nz", "br", "ar", "za", "ua", "ck",
    # ---- United Kingdom second level ----
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "ac.uk",
    "gov.uk", "nhs.uk", "police.uk", "sch.uk",
    # ---- Australia ----
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "nsw.edu.au", "vic.edu.au", "qld.edu.au",
    # ---- Japan: second level + geographic wildcards with exceptions ----
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    "tokyo.jp", "osaka.jp", "hokkaido.jp", "kyoto.jp", "okinawa.jp",
    "*.kawasaki.jp", "!city.kawasaki.jp",
    "*.kitakyushu.jp", "!city.kitakyushu.jp",
    "*.kobe.jp", "!city.kobe.jp",
    "*.nagoya.jp", "!city.nagoya.jp",
    "*.sapporo.jp", "!city.sapporo.jp",
    "*.sendai.jp", "!city.sendai.jp",
    "*.yokohama.jp", "!city.yokohama.jp",
    # ---- Brazil ----
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    "art.br", "adv.br", "blog.br", "eco.br", "emp.br", "ind.br",
    "inf.br", "jus.br", "leg.br", "med.br", "mp.br", "tv.br", "wiki.br",
    # ---- China ----
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "net.cn", "org.cn", "mil.cn",
    "bj.cn", "sh.cn", "gd.cn", "zj.cn", "js.cn",
    # ---- India ----
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "mil.in", "nic.in",
    # ---- New Zealand ----
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "iwi.nz",
    "kiwi.nz", "maori.nz", "net.nz", "org.nz", "school.nz",
    # ---- South Africa ----
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za", "net.za",
    "nom.za", "org.za", "school.za", "web.za",
    # ---- South Korea ----
    "ac.kr", "co.kr", "go.kr", "ne.kr", "or.kr", "pe.kr", "re.kr",
    "seoul.kr", "busan.kr",
    # ---- assorted multi-part registries ----
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar",
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "bel.tr",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il",
    "co.th", "in.th", "ac.th", "go.th", "net.th", "or.th",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
    # ---- whole-TLD wildcards (every label directly under is a suffix) ----
    "*.ck", "!www.ck",
    "*.bd",
    "*.er",
    "*.fk",
    "*.kh",
    "*.mm",
    "*.np",
    "*.pg",
    # ---- PRIVATE section: platform + infrastructure suffixes ----
    "github.io", "githubusercontent.com", "gitlab.io",
    "blogspot.com", "blogspot.co.uk", "blogspot.de", "blogspot.in",
    "wordpress.com", "tumblr.com", "weebly.com", "wixsite.com",
    "herokuapp.com", "netlify.app", "vercel.app", "web.app",
    "firebaseapp.com", "appspot.com", "pages.dev", "workers.dev",
    "azurewebsites.net", "cloudapp.azure.com", "trafficmanager.net",
    "cloudfront.net", "elasticbeanstalk.com",
    "s3.amazonaws.com", "s3-website-us-east-1.amazonaws.com",
    "*.compute.amazonaws.com", "*.compute-1.amazonaws.com",
    "*.elb.amazonaws.com",
    "dyndns.org", "no-ip.org", "duckdns.org", "ngrok.io",
    "fastlylb.net", "onrender.com", "fly.dev", "deno.dev", "repl.co",
)
# fmt: on


def parse_psl(text: str) -> tuple[str, ...]:
    """Parse the official Public Suffix List file format
    (publicsuffix.org/list/public_suffix_list.dat) into the rule-string
    tuple :func:`..web.registrable_domain_psl` consumes — the drop-in
    path for vendoring the COMPLETE ~9k-rule list: download the file,
    ``parse_psl(open(...).read())``, done.  Format rules per the spec:
    ``//`` comment lines and blank lines are ignored, each remaining
    line's FIRST whitespace-separated token is the rule, and both ICANN
    and PRIVATE sections are kept (section markers are comments).  IDN
    rules (the list spells them in Unicode) are punycoded per label,
    because the operator matches hosts in their IDNA/ASCII form."""
    rules = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        rule = line.split()[0]
        neg = rule.startswith("!")
        body = rule[1:] if neg else rule
        if not body.isascii():
            body = ".".join(
                lab
                if lab.isascii()
                else "xn--" + lab.encode("punycode").decode("ascii")
                for lab in body.split(".")
            )
        rules.append(("!" + body) if neg else body)
    return tuple(rules)


def synth_full_psl(n_rules: int = 9000, seed: int = 7) -> tuple[str, ...]:
    """Deterministic SYNTHETIC rule set at the real list's scale and
    shape, for measuring that rule count does not bend the PSL join's
    cost curve (round-5 verdict item 4).  The genuine list cannot be
    fetched in this offline sandbox, so this generates ~``n_rules``
    rules matching the published list's structure: a superset of
    :data:`DEFAULT_PSL_RULES`, plus synthetic ccTLD second-level
    registries (the bulk of the real list), nested geographic rules
    (the *.jp pattern), a realistic sprinkle of wildcards + exceptions,
    and PRIVATE-section platform suffixes.  Swapping in the real file is
    a data update through :func:`parse_psl`, not a code change —
    nothing in the operator depends on which rules these are."""
    import random

    rng = random.Random(seed)
    rules = list(DEFAULT_PSL_RULES)
    seen = set(rules)

    def add(r: str) -> None:
        if r not in seen:
            seen.add(r)
            rules.append(r)

    # ~1.4k single-label TLDs (the gTLD explosion in the real list);
    # 2-3 syllables give 16^2 + 16^3 = 4352 possible spellings, safely
    # above the 1400 target (1-2 syllables had only 272 — a hang)
    syll = ["foo", "bar", "zap", "qux", "lem", "vor", "tek", "mun",
            "ria", "sol", "nav", "pix", "dor", "kel", "tam", "wex"]
    while len(rules) < len(DEFAULT_PSL_RULES) + 1400:
        add("".join(rng.choice(syll) for _ in range(rng.randint(2, 3))))
    tlds = [r for r in rules if "." not in r and "*" not in r]
    # second-level registries under random ccTLD-ish tails (the bulk)
    second = ["co", "com", "net", "org", "edu", "gov", "ac", "go", "or",
              "ne", "mil", "int", "web", "info", "biz", "name", "sch"]
    while len(rules) < n_rules - 300:
        add(f"{rng.choice(second)}.{rng.choice(tlds)}")
    # nested geographic rules + wildcards + exceptions (~2%: the real
    # list's *.jp / *.ck neighborhoods)
    geo = ["kita", "minami", "naka", "higashi", "nishi", "chuo", "sakai"]
    for _ in range(150):
        base = f"{rng.choice(geo)}{rng.randint(1, 99)}.{rng.choice(tlds)}"
        add(base)
        if rng.random() < 0.4:
            add(f"*.{base}")
            if rng.random() < 0.5:
                add(f"!city.{base}")
    # PRIVATE-section platform suffixes
    plat = ["pages", "sites", "apps", "cdn", "static", "users", "hosted"]
    while len(rules) < n_rules:
        add(
            f"{rng.choice(plat)}{rng.randint(1, 999)}."
            f"{rng.choice(['com', 'net', 'io', 'dev', 'app'])}"
        )
    return tuple(rules)
