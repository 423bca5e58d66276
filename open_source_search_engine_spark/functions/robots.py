"""robots.txt parsing and rule matching, behavior-equal to the reference.

Parsing (``Robots.cpp:28-341``):
- lines split on CR/LF, ``#`` starts a comment, surrounding whitespace
  stripped, empty lines skipped (``Robots.cpp:29-99`` getNextLine)
- field = text before the first ``:`` with trailing whitespace stripped;
  recognized fields (case-insensitive): ``user-agent``, ``allow``,
  ``disallow``, ``crawl-delay`` (``Robots.cpp:103-240``)
- UA groups: our UA matches by *prefix* (``strncasecmp(value, ua, ualen)``,
  ``Robots.cpp:158``); ``*`` opens the default group; consecutive UA lines
  extend the same group; a UA line after group records closes the group
  (``Robots.cpp:241-322``)
- a specific-UA group completely overrides the default group, including
  crawl-delay (``Robots.cpp:343-370, 391-404``)
- crawl-delay parses as float seconds -> int milliseconds
  (``Robots.cpp:171-199``); -1 means unset

Matching (``RobotRule.cpp``, ``Robots.cpp:324-361``):
- rules sorted by path length, longest first (``RobotRule.h:38-40``,
  ``Robots.cpp:306-311``); first matching rule decides; default allow
- match target is path+'?'+query (``Url.h:158-166`` getPathLenWithCgi)
- ``$`` at end anchors a full match; trailing ``*`` stripped otherwise
  (``RobotRule.cpp:14-20``)
- ``*`` wildcard: greedy scan-ahead (``RobotRule.cpp:35-88``)
- rule paths containing ``%`` are percent-normalized: unreserved octets
  decoded, others uppercased, bare ``%`` -> ``%25``
  (``UrlComponent.cpp:6-45``)
"""

from __future__ import annotations

from dataclasses import dataclass, field


def percent_normalize(s: str) -> str:
    """UrlComponent::normalize (UrlComponent.cpp:6-45)."""
    out: list[str] = []
    i = 0
    n = len(s)
    while i < n:
        ch = s[i]
        if ch != "%":
            out.append(ch)
            i += 1
            continue
        if i + 2 < n or (i + 2 == n and len(s[i + 1: i + 3]) == 2):
            hex2 = s[i + 1: i + 3]
        else:
            hex2 = ""
        if len(hex2) == 2 and all(c in "0123456789abcdefABCDEF" for c in hex2):
            value = int(hex2, 16)
            unreserved = (
                0x41 <= value <= 0x5A or 0x61 <= value <= 0x7A
                or 0x30 <= value <= 0x39 or value in (0x2D, 0x2E, 0x5F, 0x7E)
            )
            if unreserved:
                out.append(chr(value))
            else:
                out.append("%" + hex2.upper())
            i += 3
        else:
            out.append("%25")
            i += 1
    return "".join(out)


@dataclass
class RobotRule:
    is_allow: bool
    path: str
    order: int = 0  # file order, tiebreak for stable longest-first sort
    anchored: bool = field(init=False)
    has_wildcard: bool = field(init=False)

    def __post_init__(self) -> None:
        p = self.path
        self.anchored = p.endswith("$")
        if not self.anchored:
            p = p.rstrip("*")
        if "%" in p:
            p = percent_normalize(p)
        self.path = p
        self.has_wildcard = "*" in p

    def sort_len(self) -> int:
        return len(self.path)

    def matches(self, path_with_cgi: str) -> bool:
        p = self.path
        if self.has_wildcard:
            return _match_wildcard(path_with_cgi, p, self.anchored)
        if self.anchored:
            return path_with_cgi == p[:-1]
        return path_with_cgi.startswith(p)


def _match_wildcard(haystack: str, needle: str, full_match: bool) -> bool:
    """Greedy-scan wildcard match (RobotRule.cpp:35-88).  ``needle`` may end
    with ``$`` when full_match — the reference compares needlePos+1==len."""
    hlen, nlen = len(haystack), len(needle)
    hpos = npos = 0
    saved_h = saved_n = 0
    in_wild = False
    while hpos < hlen and npos < nlen:
        if needle[npos] != "*":
            if in_wild:
                while hpos < hlen and needle[npos] != haystack[hpos]:
                    hpos += 1
                if hpos == hlen:
                    return full_match and (npos + 1) == nlen
                in_wild = False
                continue
            if needle[npos] == haystack[hpos]:
                npos += 1
                hpos += 1
                continue
            if saved_h or saved_n:
                in_wild = True
                saved_h += 1
                hpos = saved_h
                npos = saved_n
                continue
            return False
        in_wild = True
        while npos < nlen and needle[npos] == "*":
            npos += 1
        saved_h = hpos
        saved_n = npos
    if full_match:
        return hpos == hlen and (npos + 1) == nlen
    return npos == nlen


@dataclass
class CompiledRobots:
    """Result of parsing one robots.txt for one user agent."""
    ua_found: bool = False
    default_found: bool = False
    ua_rules: list[RobotRule] = field(default_factory=list)
    default_rules: list[RobotRule] = field(default_factory=list)
    ua_crawl_delay_ms: int = -1
    default_crawl_delay_ms: int = -1

    def active_rules(self) -> list[RobotRule]:
        if self.ua_found:
            return self.ua_rules
        if self.default_found:
            return self.default_rules
        return []

    def is_allowed(self, path_with_cgi: str) -> bool:
        for rule in self.active_rules():
            if rule.matches(path_with_cgi):
                return rule.is_allow
        return True

    def crawl_delay_ms(self) -> int:
        """-1 when unset (Robots.cpp:391-404)."""
        if self.ua_found:
            return self.ua_crawl_delay_ms
        if self.default_found:
            return self.default_crawl_delay_ms
        return -1


def _lines(text: str):
    for raw_line in text.replace("\r\n", "\n").replace("\r", "\n").split("\n"):
        line = raw_line.split("#", 1)[0].strip()
        if line:
            yield line


def _float_ms(value: str) -> int | None:
    """strtod that must consume the whole value (Robots.cpp:180-186)."""
    try:
        return int(float(value) * 1000)
    except ValueError:
        return None


def parse_robots(robots_txt: str, user_agent: str) -> CompiledRobots:
    """State machine mirror of Robots::parse (Robots.cpp:241-322)."""
    out = CompiledRobots()
    if not robots_txt:
        return out
    ua_lower = user_agent.lower()
    in_group = False
    is_ua = False  # current group is our specific UA (vs default '*')
    has_group_record = False
    order = 0
    for line in _lines(robots_txt):
        colon = line.find(":")
        if colon <= 0:
            continue
        fieldname = line[:colon].rstrip().lower()
        value = line[colon + 1:].strip()
        if fieldname == "user-agent":
            match_ua = False
            match_default = False
            if value == "*":
                out.default_found = True
                match_default = True
            elif value.lower().startswith(ua_lower):
                # reference: strncasecmp(value, m_userAgent, m_userAgentLen)
                # compares the first ualen chars of value -> "value starts
                # with our UA" prefix semantics (Robots.cpp:158)
                out.ua_found = True
                match_ua = True
            if in_group and has_group_record:
                in_group = False
                is_ua = False
                has_group_record = False
            if match_ua or match_default:
                is_ua = match_ua
                in_group = True
            continue
        if not in_group:
            continue
        if fieldname == "disallow" or fieldname == "allow":
            if value:
                rule = RobotRule(fieldname == "allow", value, order)
                order += 1
                (out.ua_rules if is_ua else out.default_rules).append(rule)
            has_group_record = True
        elif fieldname == "crawl-delay":
            ms = _float_ms(value)
            if ms is not None:
                if is_ua:
                    out.ua_crawl_delay_ms = ms
                else:
                    out.default_crawl_delay_ms = ms
            has_group_record = True
    # longest path first (Robots.cpp:306-311); stable on file order
    out.ua_rules.sort(key=lambda r: (-r.sort_len(), r.order))
    out.default_rules.sort(key=lambda r: (-r.sort_len(), r.order))
    return out


def robots_allowed_batch(robots_txts, paths, user_agent: str) -> list[bool]:
    """Batch evaluate (robots_txt, path_with_cgi) pairs — cache-compiled per
    distinct robots body so a million URLs on one host compile once."""
    cache: dict[str, CompiledRobots] = {}
    out = []
    for txt, path in zip(robots_txts, paths):
        key = txt or ""
        compiled = cache.get(key)
        if compiled is None:
            compiled = parse_robots(key, user_agent)
            cache[key] = compiled
        out.append(compiled.is_allowed(path or "/"))
    return out


def crawl_delay_batch(robots_txts, user_agent: str) -> list[int]:
    cache: dict[str, int] = {}
    out = []
    for txt in robots_txts:
        key = txt or ""
        ms = cache.get(key)
        if ms is None:
            ms = parse_robots(key, user_agent).crawl_delay_ms()
            cache[key] = ms
        out.append(ms)
    return out
