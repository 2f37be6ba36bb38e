"""url_canon_dedup planted properties: kernel boundary rules
(non-default port kept, `referrer=` survives the `^ref=` anchor, path
case/segments untouched, param sort bytewise) and family-level decoy
census over the planted fixture (value-differing decoy is its own
group; the case-folded/ported/fragmented variants of one page all
collapse onto it)."""

import pandas as pd


def test_canonicalize_urls_kernel_rules():
    from darc_ray.functions.link import canonicalize_urls

    s = pd.Series([
        "HTTPS://Site.Example:443/p/1?b=2&a=1#frag",   # all rules at once
        "https://site.example:80/p/1",                 # :80 NOT https default
        "http://site.example:443/p/1",                 # :443 NOT http default
        "https://site.example/p/1?referrer=x&ref=y",   # key boundary
        "https://site.example/ref/2?utm_source=a",     # path segment kept
        "https://site.example/P/3",                    # path case significant
        "http://site.example/p?z=1&a=9&a=10",          # bytewise: "10" < "9"
    ])
    out = canonicalize_urls(s)
    assert out.loc[0, "canon"] == "https://site.example/p/1?a=1&b=2"
    assert out.loc[1, "canon"] == "https://site.example:80/p/1"
    assert out.loc[2, "canon"] == "http://site.example:443/p/1"
    assert out.loc[3, "canon"] == "https://site.example/p/1?referrer=x"
    assert out.loc[3, "n_stripped"] == 1
    assert out.loc[4, "canon"] == "https://site.example/ref/2"
    assert out.loc[4, "n_stripped"] == 1
    assert out.loc[5, "canon"] == "https://site.example/P/3"
    assert out.loc[6, "canon"] == "http://site.example/p?a=10&a=9&z=1"
    assert out["n_stripped"].tolist() == [0, 0, 0, 1, 1, 0, 0]


def test_canonicalize_urls_unparseable_passthrough():
    from darc_ray.functions.link import canonicalize_urls

    s = pd.Series(["example.com/p?utm_source=x",   # schemeless
                   "mailto:a@b.c",                 # opaque
                   "/relative/path",
                   "https://ok.example/p"])
    out = canonicalize_urls(s)
    # unparseable rows pass through verbatim, never dropped
    assert out["canon"].tolist()[:3] == s.tolist()[:3]
    assert out["n_stripped"].tolist() == [0, 0, 0, 0]
    assert out.loc[3, "canon"] == "https://ok.example/p"
    assert len(out) == len(s)


def test_url_canon_dedup_planted_census(ray_session):
    from darc_ray.pipelines.queries import q_url_canon_dedup

    out = q_url_canon_dedup("/root/testdata/sf0.001").set_index("canon")

    # value-differing decoy (a=1&b=3) is its OWN singleton group
    assert out.loc["https://site0.example/p/0?a=1&b=3",
                   "n_variants"] == 1
    # referrer= survives stripping and keeps its page distinct
    assert out.loc["https://site1.example/p/1?page=3&referrer=x",
                   "n_variants"] == 1
    # /ref/ path segment untouched
    assert out.loc["https://site2.example/ref/2", "n_variants"] == 1
    # path case splits: /P/3 and /p/3 are DISTINCT singletons (page
    # h=3,p=3 itself is http with params, so neither decoy collapses
    # into it — scheme and params are part of the canonical)
    assert out.loc["https://site3.example/P/3", "n_variants"] == 1
    assert out.loc["https://site3.example/p/3", "n_variants"] == 1
    assert out.loc["http://site3.example/p/3?a=1&b=2", "n_variants"] == 2
    # keeper is always the smallest url_id in the group
    assert (out["keeper_id"]
            == out["keeper_id"].groupby(level=0).min()).all()
