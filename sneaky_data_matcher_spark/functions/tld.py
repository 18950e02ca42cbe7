"""Frozen public IANA TLD snapshot for EmailValidator(true, true) parity.

The reference validates email domains with commons-validator 1.7's
``EmailValidator.getInstance(true, true)`` (services/
RecordValidationUtilService.java:17-23), whose ``DomainValidator`` checks
the FINAL domain label against compiled-in arrays of IANA TLDs — themselves
a frozen snapshot of the public IANA root-zone database. This module plays
the same role: a frozen, public-knowledge snapshot embedded as data.

Snapshot provenance and completeness (recorded per VERDICT r3 #8):
  - ``CC_TLDS``: the delegated ISO 3166-1 alpha-2 country-code TLDs plus
    the delegated exceptional reservations (uk, su, ac, eu). This set is
    stable and complete to public knowledge as of the snapshot date.
  - ``GENERIC_TLDS``: the original/sponsored generic TLDs (complete) plus
    a PARTIAL selection of post-2013 new-gTLD program strings. The full
    IANA root zone carries ~1,250 generic strings (including brand TLDs
    like ``.google`` and ~150 ``xn--`` IDN strings); embedding all of them
    from memory would fabricate data, so this snapshot keeps the exact
    legacy set plus the high-traffic new gTLDs and DOCUMENTS the partial
    coverage. Emails whose TLD is real but outside the snapshot are
    rejected by the ``check_tld`` mode — the same failure class a stale
    commons-validator jar exhibits against newly delegated TLDs.
  - ``INFRA_TLDS``: the infrastructure TLD (arpa).

Snapshot date: 2026-08-21 (sandbox build date; no network access — the
list is reproduced from public knowledge, not fetched).

The default email path (``canonicalize.email_is_valid``) stays structural
(no TLD-list check) and oracle-certified; ``check_tld=True`` opts into this
snapshot, mirroring how the reference's behavior depends on the
commons-validator jar's own frozen arrays.
"""

from __future__ import annotations

# Delegated ccTLDs (ISO 3166-1 alpha-2 + delegated exceptional reservations).
CC_TLDS: tuple[str, ...] = (
    "ac", "ad", "ae", "af", "ag", "ai", "al", "am", "ao", "aq", "ar", "as",
    "at", "au", "aw", "ax", "az", "ba", "bb", "bd", "be", "bf", "bg", "bh",
    "bi", "bj", "bm", "bn", "bo", "bq", "br", "bs", "bt", "bv", "bw", "by",
    "bz", "ca", "cc", "cd", "cf", "cg", "ch", "ci", "ck", "cl", "cm", "cn",
    "co", "cr", "cu", "cv", "cw", "cx", "cy", "cz", "de", "dj", "dk", "dm",
    "do", "dz", "ec", "ee", "eg", "er", "es", "et", "eu", "fi", "fj", "fk",
    "fm", "fo", "fr", "ga", "gb", "gd", "ge", "gf", "gg", "gh", "gi", "gl",
    "gm", "gn", "gp", "gq", "gr", "gs", "gt", "gu", "gw", "gy", "hk", "hm",
    "hn", "hr", "ht", "hu", "id", "ie", "il", "im", "in", "io", "iq", "ir",
    "is", "it", "je", "jm", "jo", "jp", "ke", "kg", "kh", "ki", "km", "kn",
    "kp", "kr", "kw", "ky", "kz", "la", "lb", "lc", "li", "lk", "lr", "ls",
    "lt", "lu", "lv", "ly", "ma", "mc", "md", "me", "mg", "mh", "mk", "ml",
    "mm", "mn", "mo", "mp", "mq", "mr", "ms", "mt", "mu", "mv", "mw", "mx",
    "my", "mz", "na", "nc", "ne", "nf", "ng", "ni", "nl", "no", "np", "nr",
    "nu", "nz", "om", "pa", "pe", "pf", "pg", "ph", "pk", "pl", "pm", "pn",
    "pr", "ps", "pt", "pw", "py", "qa", "re", "ro", "rs", "ru", "rw", "sa",
    "sb", "sc", "sd", "se", "sg", "sh", "si", "sj", "sk", "sl", "sm", "sn",
    "so", "sr", "ss", "st", "su", "sv", "sx", "sy", "sz", "tc", "td", "tf",
    "tg", "th", "tj", "tk", "tl", "tm", "tn", "to", "tr", "tt", "tv", "tw",
    "tz", "ua", "ug", "uk", "us", "uy", "uz", "va", "vc", "ve", "vg", "vi",
    "vn", "vu", "wf", "ws", "ye", "yt", "za", "zm", "zw",
)

# Infrastructure TLD.
INFRA_TLDS: tuple[str, ...] = ("arpa",)

# Original + sponsored generic TLDs (complete), then a documented-PARTIAL
# selection of post-2013 new-gTLD strings (high-traffic, public knowledge).
GENERIC_TLDS: tuple[str, ...] = (
    # legacy / sponsored (complete set)
    "com", "org", "net", "edu", "gov", "mil", "int",
    "aero", "asia", "biz", "cat", "coop", "info", "jobs", "mobi", "museum",
    "name", "pro", "tel", "travel", "post", "xxx",
    # new-gTLD program (PARTIAL snapshot — see module docstring)
    "academy", "agency", "app", "art", "bank", "bar", "bio", "blog",
    "build", "business", "buzz", "cafe", "camp", "capital", "care",
    "careers", "casa", "cash", "casino", "center", "chat", "cheap",
    "church", "city", "claims", "cleaning", "clinic", "clothing", "cloud",
    "club", "coach", "codes", "coffee", "community", "company", "computer",
    "construction", "consulting", "cool", "coupons", "courses", "credit",
    "cricket", "cruises", "dance", "date", "dating", "deals", "degree",
    "delivery", "dental", "dentist", "design", "dev", "diamonds", "diet",
    "digital", "direct", "directory", "discount", "dog", "domains",
    "download", "earth", "education", "email", "energy", "engineer",
    "engineering", "enterprises", "equipment", "estate", "events",
    "exchange", "expert", "exposed", "express", "fail", "faith", "family",
    "fans", "farm", "fashion", "film", "finance", "financial", "fish",
    "fishing", "fitness", "flights", "florist", "flowers", "football",
    "forsale", "foundation", "fun", "fund", "furniture", "futbol", "fyi",
    "gallery", "games", "garden", "gift", "gifts", "gives", "glass",
    "global", "gmbh", "gold", "golf", "graphics", "gratis", "green",
    "gripe", "group", "guide", "guitars", "guru", "health", "hockey",
    "holdings", "holiday", "horse", "host", "hosting", "house", "immo",
    "industries", "ink", "institute", "insure", "international",
    "investments", "irish", "jetzt", "jewelry", "kaufen", "kim", "kitchen",
    "land", "lawyer", "lease", "legal", "lgbt", "life", "limited", "limo",
    "link", "live", "loan", "loans", "lol", "love", "ltd", "luxury",
    "maison", "management", "market", "marketing", "markets", "mba",
    "media", "memorial", "men", "menu", "moda", "moe", "mom", "money",
    "mortgage", "movie", "navy", "network", "news", "ninja", "one", "onl",
    "online", "ooo", "organic", "page", "paris", "partners", "parts",
    "party", "pet", "pharmacy", "phone", "photo", "photography", "photos",
    "physio", "pics", "pictures", "pink", "pizza", "place", "plumbing",
    "plus", "poker", "porn", "press", "productions", "promo", "properties",
    "pub", "quebec", "racing", "red", "rehab", "reise", "reisen", "rent",
    "rentals", "repair", "report", "republican", "rest", "restaurant",
    "review", "reviews", "rich", "rip", "rocks", "rodeo", "run", "sale",
    "sarl", "school", "schule", "science", "scot", "security", "services",
    "sex", "sexy", "shoes", "shop", "show", "singles", "site", "ski",
    "soccer", "social", "software", "solar", "solutions", "soy", "space",
    "srl", "store", "stream", "studio", "study", "style", "sucks",
    "supplies", "supply", "support", "surf", "surgery", "systems",
    "tattoo", "tax", "taxi", "team", "tech", "technology", "tennis",
    "theater", "tickets", "tienda", "tips", "tires", "tirol", "today",
    "tokyo", "tools", "top", "tours", "town", "toys", "trade", "training",
    "tube", "university", "uno", "vacations", "vegas", "ventures", "vet",
    "viajes", "video", "villas", "vin", "vip", "vision", "vlaanderen",
    "vodka", "vote", "voting", "voyage", "wales", "wang", "watch",
    "webcam", "website", "wedding", "wien", "wiki", "win", "wine", "work",
    "works", "world", "wtf", "xyz", "yoga", "zone",
)

ALL_TLDS: frozenset[str] = frozenset(CC_TLDS) | frozenset(INFRA_TLDS) | frozenset(
    GENERIC_TLDS
)

SNAPSHOT_DATE = "2026-08-21"


def is_known_tld(label: str) -> bool:
    """Case-insensitive membership in the frozen snapshot (pyoracle side)."""
    return label.lower() in ALL_TLDS


def tld_sql_in_list() -> str:
    """The snapshot as a SQL IN-list literal (for DuckDB oracle twins)."""
    return "(" + ", ".join(f"'{t}'" for t in sorted(ALL_TLDS)) + ")"
