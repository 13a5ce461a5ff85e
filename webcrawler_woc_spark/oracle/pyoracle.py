"""Pure-Python single-process oracle for the crawl dataflow (ops 1-19).

Re-implements the reference's BFS loop (src/crawler.rs:32-195) with the
engine's pinned deterministic semantics (SURVEY.md §7): batch wave barrier,
race-free seen updates, politeness slots ordering. Shares the kernel
functions (urlnorm/html) with the engine — the control flow (waves, routing,
dedup, budgets, residual flush) is written independently, which is what the
golden E2E tests compare.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..functions.html import (
    contains_words,
    extract_links,
    links_from_text,
    sitemap_urls_from_robots,
)
from ..functions.urlnorm import host_of, link_type_of, parse_absolute

HTML_MIMES = ("text/html", "text/html; charset=utf-8")
DEFAULT_CRAWL_DELAY = 1


@dataclass
class OracleResult:
    links_out: list[dict] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    rejected: set[str] = field(default_factory=set)
    flagged: set[str] = field(default_factory=set)
    crawl_order: list[tuple[int, str | None, int, str]] = field(default_factory=list)
    extracted_text: dict[str, str] = field(default_factory=dict)
    waves: int = 0


def _should_crawl(host, whitelist, blacklist) -> bool:
    """links.rs:122-143, including the neither-list => false quirk."""
    if whitelist is not None:
        return host in whitelist if host is not None else False
    if blacklist is not None:
        return (host not in blacklist) if host is not None else False
    return False


def _robots_bodies(pages: dict[str, bytes]) -> dict[str, str]:
    """host -> robots body; when a host contributes several bodies (http +
    https twins, duplicate rows) pick min(text) — the same deterministic
    one-body-per-host reduce as politeness._tag_robots_lines. Anchored to
    the HOST ROOT exactly like the engine's _robots_frame regex: a nested
    /blog/robots.txt is not a robots file and must not join the reduce."""
    bodies: dict[str, str] = {}
    for url, body in pages.items():
        if re.match(r"^https?://[^/]+/robots\.txt$", url):
            host = host_of(url)
            if host:
                text = body.decode("utf-8", "replace")
                if host not in bodies or text < bodies[host]:
                    bodies[host] = text
    return bodies


def _crawl_delays(pages: dict[str, bytes], user_agent: str = "*") -> dict[str, int]:
    """Group-scoped Crawl-delay, the twin of politeness.parse_robots_crawl_delay:
    first Crawl-delay line (file order) among the groups selected for our
    agent (specific-if-any-else-'*'); DEFAULT_CRAWL_DELAY when none."""
    delays: dict[str, int] = {}
    for host, text in _robots_bodies(pages).items():
        groups = _robots_groups(text)
        specific = [
            g for g in groups if any(a.lower() == user_agent.lower() for a in g[0])
        ]
        chosen = specific if specific else [g for g in groups if "*" in g[0]]
        delay = DEFAULT_CRAWL_DELAY
        for _agents, grules in chosen:
            found = next(
                (int(v) for t, v in grules if t == "crawl-delay" and v.isdigit()), None
            )
            if found is not None:
                delay = found
                break
        delays[host] = delay
    return delays


def _robots_groups(text: str) -> list[tuple[set[str], list[tuple[str, str]]]]:
    """RFC 9309 group walk, the Python twin of politeness.parse_robots_rules:
    a group starts at a User-agent line whose PREDECESSOR LINE is not a
    User-agent line (consecutive UA lines share the group); Allow/Disallow/
    Crawl-delay lines bind to the current group; rules before any UA line
    bind to none. [ \\t] not \\s: a bare "Disallow:" line (allow-all) must
    not let the match cross the newline and steal the next line's token.
    Crawl-delay captures leading digits only ((\\d+), like the engine's
    regexp_extract) so a malformed "5x" value still yields 5 on both sides.

    Returns [(agents, [(rule_type, prefix_or_value), ...]), ...]."""
    groups: list[tuple[set[str], list[tuple[str, str]]]] = []
    agents: set[str] = set()
    rules: list[tuple[str, str]] = []
    prev_ua = False
    started = False
    for line in text.split("\n"):
        m_ua = re.match(r"^User-agent:[ \t]*(\S+)", line)
        if m_ua:
            if not prev_ua:
                if started:
                    groups.append((agents, rules))
                agents, rules = set(), []
                started = True
            agents.add(m_ua.group(1))
            prev_ua = True
            continue
        prev_ua = False
        m_r = re.match(r"^(Allow|Disallow):[ \t]*(\S+)", line)
        if m_r and started:
            rules.append((m_r.group(1).lower(), m_r.group(2)))
            continue
        m_d = re.match(r"^Crawl-delay:[ \t]*(\d+)", line)
        if m_d and started:
            rules.append(("crawl-delay", m_d.group(1)))
    if started:
        groups.append((agents, rules))
    return groups


def _disallow_rules(pages: dict[str, bytes], user_agent: str = "*") -> dict[str, list[str]]:
    """(host -> [path prefixes]) from the Disallow lines of /robots.txt
    groups binding to our agent — group-scoped with RFC 9309 §2.2.1
    specificity (groups naming our agent suppress the '*' fallback),
    the same walk as politeness.parse_robots_rules."""
    rules: dict[str, list[str]] = {}
    for host, text in _robots_bodies(pages).items():
        groups = _robots_groups(text)
        specific = [
            g for g in groups if any(a.lower() == user_agent.lower() for a in g[0])
        ]
        chosen = specific if specific else [g for g in groups if "*" in g[0]]
        for _agents, grules in chosen:
            for rtype, prefix in grules:
                if rtype == "disallow":
                    rules.setdefault(host, []).append(prefix)
    return rules


def _url_path(url: str) -> str:
    m = re.match(r"^https?://[^/?#]+([^?#]*)", url)
    return m.group(1) if m else ""


def _rule_matches(path: str, rule: str) -> bool:
    """Google robots-spec rule match (twin of politeness.filter_disallowed):
    plain rule = path prefix; '*' matches any sequence; trailing '$' anchors
    the end."""
    if "*" not in rule and not rule.endswith("$"):
        return path.startswith(rule)
    body, anchored = (rule[:-1], True) if rule.endswith("$") else (rule, False)
    rx = "^" + ".*".join(re.escape(part) for part in body.split("*"))
    if anchored:
        rx += "$"
    return re.match(rx, path) is not None


def _is_disallowed(url: str, rules: dict[str, list[str]]) -> bool:
    host = host_of(url)
    path = _url_path(url)
    return any(_rule_matches(path, p) for p in rules.get(host, ()))


def _fetch_ms(url: str) -> int:
    """Python twin of operators/fetch.synth_fetch_ms (must match exactly)."""
    acc = 0
    for ch in url:
        acc = (acc * 31 + ord(ch)) % (10**15 - 11)
    m = acc % 1_000_003
    return (m * m) % 19_997


def crawl_oracle(
    pages: dict[str, bytes],
    seeds: list[tuple[str, float]],
    whitelist: list[str] | None = None,
    blacklist: list[str] | None = None,
    words: list[str] | None = None,
    depth: int | None = 1,
    host_budget: int | None = None,
    content_type_fn=None,
    child_priority: float = 0.0,
    max_waves: int = 50,
    timeout_ms: int | None = None,
    respect_disallow: bool = False,
) -> OracleResult:
    if content_type_fn is None:
        from ..sources.corpus import default_content_type_py

        content_type_fn = default_content_type_py
    words = words or []
    wl = set(whitelist) if whitelist is not None else None
    bl = set(blacklist) if blacklist is not None else None
    delays = _crawl_delays(pages) if host_budget is not None else {}
    disallow = _disallow_rules(pages) if respect_disallow else {}

    res = OracleResult()
    frontier: dict[str, float] = {}
    for raw, prio in seeds:
        canon = parse_absolute(raw)
        if canon is not None:
            frontier[canon] = float(prio)

    wave = 0
    while True:
        if depth is not None and wave >= depth:
            break
        if depth is None and (not frontier or wave >= max_waves):
            break

        # robots Disallow gate (opt-in; mirrors plans/wave.py)
        if disallow:
            frontier = {
                u: p for u, p in frontier.items() if not _is_disallowed(u, disallow)
            }

        # politeness schedule: per-host (priority DESC, url ASC), slot <= budget
        by_host: dict[str | None, list[str]] = {}
        for url in frontier:
            by_host.setdefault(host_of(url), []).append(url)
        scheduled: list[tuple[str | None, int, str]] = []
        deferred: dict[str, float] = {}
        for host in sorted(by_host, key=lambda h: (h is None, h)):
            urls = sorted(by_host[host], key=lambda u: (-frontier[u], u))
            if host_budget is None:
                budget = len(urls)
            else:
                budget = max(1, host_budget // delays.get(host, DEFAULT_CRAWL_DELAY))
            for slot, url in enumerate(urls[:budget], start=1):
                scheduled.append((host, slot, url))
            for url in urls[budget:]:
                deferred[url] = frontier[url]
        for host, slot, url in scheduled:
            res.crawl_order.append((wave, host, slot, url))

        children: list[str] = []
        for host, slot, url in scheduled:
            res.seen.add(url)
            fetched = url in pages
            if fetched and timeout_ms is not None and _fetch_ms(url) >= timeout_ms:
                fetched = False  # timed out: body never read (crawler.rs:209-216)
            ct = content_type_fn(url) if fetched else None
            cw = False
            # None-guard: a caller-supplied content_type_fn may return None
            # for a fetched URL; mime crate lowercases (links.rs:159-176)
            if fetched and ct is not None and ct.lower() in HTML_MIMES:
                html = pages[url].decode("utf-8", "replace")
                if words and contains_words(html, words):
                    cw = True
                    res.flagged.add(url)
                children.extend(extract_links(html, url))
                from ..functions.html import extract_text

                res.extracted_text[url] = extract_text(html)
            res.links_out.append(
                {
                    "url": url,
                    "host": host,
                    "content_type": ct,
                    "crawled": True,
                    "link_type": link_type_of(url),
                    "contains_words": cw,
                    "fetched": fetched,
                }
            )

        # sitemap seeding: first wave of no-depth mode only (crawler.rs:140-148)
        if depth is None and wave == 0:
            from ..operators.sitemaps import robots_url_of

            for seed_url, _ in seeds:
                canon = parse_absolute(seed_url)
                if canon is None:
                    continue
                robots_url = robots_url_of(canon)
                if robots_url not in pages:
                    continue
                robots_body = pages[robots_url].decode("utf-8", "replace")
                for sm_url in sitemap_urls_from_robots(robots_body, canon):
                    if sm_url not in pages:
                        continue
                    sm_ct = content_type_fn(sm_url)
                    if sm_ct.split(";")[0].strip() != "text/plain":
                        continue
                    sm_body = pages[sm_url].decode("utf-8", "replace")
                    children.extend(links_from_text(sm_body, sm_url))

        # routing (crawler.rs:82-99, batch semantics)
        next_frontier: dict[str, float] = dict(deferred)
        for curl in sorted(set(children)):
            host = host_of(curl)
            sc = _should_crawl(host, wl, bl)
            if sc and curl not in res.seen:
                next_frontier[curl] = max(child_priority, next_frontier.get(curl, child_priority))
            elif not sc and curl not in res.rejected:
                res.rejected.add(curl)
                res.links_out.append(
                    {
                        "url": curl,
                        "host": host,
                        "content_type": None,
                        "crawled": False,
                        "link_type": link_type_of(curl),
                        "contains_words": False,
                        "fetched": False,
                    }
                )
        frontier = next_frontier
        res.waves += 1
        wave += 1

    # residual flush, depth mode only (crawler.rs:102-108)
    if depth is not None:
        for url in sorted(frontier):
            res.links_out.append(
                {
                    "url": url,
                    "host": host_of(url),
                    "content_type": None,
                    "crawled": False,
                    "link_type": link_type_of(url),
                    "contains_words": False,
                    "fetched": False,
                }
            )
    return res
