"""Sequential pure-Python oracle of the reference bucketizer semantics.

This is the ground truth the distributed Spark engine is tested against
(SURVEY.md §5.2 step 1): a tiny, strictly-sequential, one-member-at-a-time
re-implementation of the reference strategies, pinned by pytest against every
assertion in the reference Jest suites (SURVEY.md §5.1).

Semantics sources (behavioral citations into /root/reference):
- BasicBucketizer (arrival-order pager):
  packages/bucketizer-basic/lib/BasicBucketizer.ts:47-94
- SubstringBucketizer (character radix trie with per-node capacity):
  packages/bucketizer-substring/lib/SubstringBucketizer.ts:44-148
- SubjectPageBucketizer (subject page index + root rotation):
  packages/bucketizer-subject-page/lib/SubjectPageBucketizer.ts:47-131
- Fallback pager (no property match → bucketless pages):
  packages/bucketizer-core/lib/BucketizerCore.ts:375-396
- Relation dedup via hypermedia-controls map: BucketizerCore.ts:108-123, 174-184
- Immutable marking: BucketizerCore.ts:311-312

Inputs are plain property-value lists (our engine has a fixed column schema,
SURVEY.md §1.4), not RDF quad bags; multi-valued properties are lists with
len > 1. ``values=None``/``[]`` triggers the fallback path exactly like a
zero-match property path (BucketizerCore.ts:294-300).
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass, field

_COMBINING = re.compile("[\u0300-\u036f]")
_COMMA_APOS = re.compile("[,']")


def normalize_substring(literal: str) -> str:
    """trim → NFKD → strip combining marks → strip [,'] → '-'→' ' → lower.

    Behavioral spec: SubstringBucketizer.ts:119-125; pinned by the NFKD tests
    SubstringBucketizer.test.ts:280-318 (ñ → n; bare combining tilde dropped).
    """
    s = unicodedata.normalize("NFKD", literal.strip())
    s = _COMBINING.sub("", s)
    s = _COMMA_APOS.sub("", s)
    s = s.replace("-", " ")
    return s.lower()


def normalize_subject(literal: str) -> str:
    """Same pipeline but '#'→'-' instead of '-'→' '.

    Behavioral spec: SubjectPageBucketizer.ts:98-103; pinned by
    SubjectPageBucketizer.test.ts:84-99 (wgs84_pos#Point → wgs84_pos-point).
    """
    s = unicodedata.normalize("NFKD", literal.strip())
    s = _COMBINING.sub("", s)
    s = _COMMA_APOS.sub("", s)
    s = s.replace("#", "-")
    return s.lower()


# Short relation-type names; the reference reifies full tree: IRIs
# (RelationType enum from @treecg/types used at BasicBucketizer.ts:92,
# SubstringBucketizer.ts:141, SubjectPageBucketizer.ts:107).
REL_RELATION = "Relation"
REL_SUBSTRING = "Substring"
REL_EQUAL = "EqualThan"
REL_GEO = "GeospatiallyContains"


@dataclass(frozen=True)
class Relation:
    """One hypermedia relation edge (expandRelation, BucketizerCore.ts:125-160)."""

    from_bucket: str
    relation_type: str
    to_bucket: str
    values: tuple[str, ...] = ()
    path: str | None = None


@dataclass
class BucketizeOutput:
    """Per-member result of one bucketize() call (BucketizerCore.ts:311-315)."""

    member_id: str
    buckets: list[str]
    relations: list[Relation]
    seals: list[str]  # sds:immutable marks emitted by this call


class _OracleBase:
    """Shared state: hypermedia-controls map + fallback pager counters."""

    def __init__(self, page_size: int = 50, root: str = "root") -> None:
        self.page_size = page_size
        self.root = root
        # BucketId -> [Relation] (bucketHypermediaControlsMap, BucketizerCore.ts:81)
        self.controls: dict[str, list[Relation]] = {}
        self.bucketless_page = 0
        self.bucketless_counter = 0

    # -- controls map (BucketizerCore.ts:108-123, 174-184) -------------------
    def _controls(self, bucket: str, create: bool = False) -> list[Relation]:
        if create and bucket not in self.controls:
            self.controls[bucket] = []
        return self.controls.get(bucket, [])

    def _add_control(self, bucket: str, rel: Relation) -> None:
        self.controls.setdefault(bucket, []).append(rel)

    # -- fallback pager (BucketizerCore.ts:375-396) ---------------------------
    def fallback(self, new_relations: list[Relation]) -> str:
        if self.page_size and self.bucketless_counter == self.page_size:
            self.bucketless_page += 1
            self.bucketless_counter = 0
        name = f"bucketless-{self.bucketless_page}"
        root_controls = self.controls.get(self.root)
        if not root_controls or all(r.to_bucket != name for r in root_controls):
            rel = Relation(self.root, REL_RELATION, name)
            new_relations.append(rel)
            self._add_control(self.root, rel)
        self.bucketless_counter += 1
        return name

    # -- dispatch (BucketizerCore.ts:287-323) ---------------------------------
    def bucketize(
        self, values: list[str] | None, member_id: str
    ) -> BucketizeOutput:
        new_relations: list[Relation] = []
        immutables: list[str] = []
        if not values:
            buckets = [self.fallback(new_relations)]
        else:
            try:
                buckets = self._create_buckets(values, new_relations, immutables)
            except Exception:
                buckets = [self.fallback(new_relations)]
        return BucketizeOutput(member_id, buckets, new_relations, immutables)

    def _create_buckets(
        self,
        values: list[str],
        new_relations: list[Relation],
        immutables: list[str],
    ) -> list[str]:
        raise NotImplementedError

    # -- state snapshot (exportState/importState, BucketizerCore.ts:186-197) --
    def export_state(self) -> dict:
        return {
            "controls": {
                k: [list((r.from_bucket, r.relation_type, r.to_bucket,
                          list(r.values), r.path)) for r in v]
                for k, v in self.controls.items()
            },
            "bucketless_page": self.bucketless_page,
            "bucketless_counter": self.bucketless_counter,
        }

    def import_state(self, state: dict) -> None:
        self.controls = {
            k: [Relation(a, b, c, tuple(vs), p) for a, b, c, vs, p in v]
            for k, v in state["controls"].items()
        }
        self.bucketless_page = state["bucketless_page"]
        self.bucketless_counter = state["bucketless_counter"]


class BasicOracle(_OracleBase):
    """Arrival-order pager (BasicBucketizer.ts:47-94).

    Pure function of the 0-based arrival index: bucket = str(idx // page_size);
    a Relation(page-1 → page) is emitted with the first member of each new page.
    Ignores property values entirely (bucketize is overridden in the
    reference, BasicBucketizer.ts:47).
    """

    def __init__(self, page_size: int = 50) -> None:
        super().__init__(page_size=page_size, root="0")
        self.page_number = 0
        self.member_counter = 0

    def bucketize(
        self, values: list[str] | None, member_id: str
    ) -> BucketizeOutput:
        new_relations: list[Relation] = []
        if self.member_counter >= self.page_size:
            current = self.page_number
            self.page_number += 1
            self.member_counter = 0
            rel = Relation(str(current), REL_RELATION, str(self.page_number))
            self._add_control(str(current), rel)
            new_relations.append(rel)
        self.member_counter += 1
        return BucketizeOutput(
            member_id, [str(self.page_number)], new_relations, []
        )

    def export_state(self) -> dict:
        s = super().export_state()
        s.update(page_number=self.page_number, member_counter=self.member_counter)
        return s

    def import_state(self, state: dict) -> None:
        super().import_state(state)
        self.page_number = state["page_number"]
        self.member_counter = state["member_counter"]


class SubstringOracle(_OracleBase):
    """Character radix trie with per-node page capacity
    (SubstringBucketizer.ts:44-148).

    Walk the normalized value character by character from the root: place the
    member in the first node with room; a full node either descends into an
    existing child (one more character) or creates the child (relation +
    placement). A single-word value whose whole string is consumed is placed
    in the full-string node even when full, without a counter update
    (SubstringBucketizer.ts:88-93, test :244-278); a multi-word value whose
    chain is exhausted gets no bucket at all.
    """

    def __init__(self, page_size: int = 50, root: str = "root") -> None:
        super().__init__(page_size=page_size, root=root)
        # bucketCounterMap, root seeded 0 (SubstringBucketizer.ts:30-31)
        self.counters: dict[str, int] = {root: 0}

    def _has_room(self, bucket: str) -> bool:
        return bucket not in self.counters or self.counters[bucket] < self.page_size

    def _bump(self, bucket: str) -> None:
        self.counters[bucket] = self.counters.get(bucket, 0) + 1

    def _create_buckets(self, values, new_relations, immutables):
        buckets: list[str] = []
        for value in values:
            norm = normalize_substring(value)
            parts = norm.split(" ")
            current = self.root
            substring = ""
            found = False
            for part in parts:
                for ch in part:
                    if self._has_room(current):
                        self._bump(current)
                        buckets.append(current)
                        found = True
                        break
                    substring += ch
                    if all(
                        r.to_bucket != substring
                        for r in self._controls(current, create=True)
                    ):
                        rel = Relation(
                            current,
                            REL_SUBSTRING,
                            substring,
                            tuple(substring.split("+")),
                        )
                        new_relations.append(rel)
                        self._add_control(current, rel)
                        current = substring
                        self._bump(current)
                        buckets.append(current)
                        found = True
                        break
                    current = substring
                if found:
                    break
                if len(parts) > 1:
                    substring += "+"
                else:
                    buckets.append(substring)
                    break
        # JS `new Set` preserves insertion order (SubstringBucketizer.ts:97)
        return list(dict.fromkeys(buckets))

    def export_state(self) -> dict:
        s = super().export_state()
        s["counters"] = dict(self.counters)
        return s

    def import_state(self, state: dict) -> None:
        super().import_state(state)
        self.counters = dict(state["counters"])


class SubjectPageOracle(_OracleBase):
    """Subject page index with root rotation
    (SubjectPageBucketizer.ts:47-131).

    bucket = normalize(last '/'-segment of value + '-' + salt). First sighting
    of a bucket emits an EqualThan relation from the current root; after
    max_relations new buckets the root is sealed (immutable), rotated to
    root-N, and linked root-(N-1) → root-N.
    """

    def __init__(
        self,
        page_size: int = 50,
        root: str = "root",
        salt: str = "s0",
        max_relations: int = 100,
        property_path: str | None = None,
    ) -> None:
        super().__init__(page_size=page_size, root=root)
        self.salt = salt  # pinned stand-in for Math.random (ts:37; test :92)
        self.max_relations = max_relations  # default 100, ts:36
        self.property_path = property_path
        self.root_relation_count = 0
        self.root_count = 0

    def _root_name(self) -> str:
        if self.root_count == 0:
            return self.root
        return f"{self.root}-{self.root_count}"

    def _current_start(self, new_relations, immutables) -> str:
        # getCurrentStart, SubjectPageBucketizer.ts:55-72
        if self.root_relation_count == self.max_relations:
            frm = self._root_name()
            immutables.append(frm)
            self.root_relation_count = 0
            self.root_count += 1
            new_relations.append(Relation(frm, REL_RELATION, self._root_name()))
        self.root_relation_count += 1
        return self._root_name()

    def _create_buckets(self, values, new_relations, immutables):
        buckets: list[str] = []
        for value in values:
            part = value.split("/")[-1] + "-" + self.salt
            bid = normalize_subject(part)
            if bid not in self.controls:
                self.controls[bid] = []
                start = self._current_start(new_relations, immutables)
                new_relations.append(
                    Relation(start, REL_EQUAL, bid, (value,), self.property_path)
                )
            buckets.append(bid)
        return buckets

    def export_state(self) -> dict:
        s = super().export_state()
        s.update(
            root_relation_count=self.root_relation_count,
            root_count=self.root_count,
            max_relations=self.max_relations,
            salt=self.salt,
        )
        return s

    def import_state(self, state: dict) -> None:
        super().import_state(state)
        self.root_relation_count = state["root_relation_count"]
        self.root_count = state["root_count"]
        self.max_relations = state["max_relations"]
        self.salt = state["salt"]


def _tile_x(lon: int, zoom: int) -> int:
    import math

    return math.floor((lon + 180) / 360 * 2**zoom)


def _tile_y(lat: int, zoom: int) -> int:
    import math

    rad = lat * math.pi / 180
    return math.floor(
        (1 - math.log(math.tan(rad) + 1 / math.cos(rad)) / math.pi) / 2 * 2**zoom
    )


def tile_bbox_wkt(x: int, y: int, zoom: int) -> str:
    """Tile bounding-box polygon (web-mercator slippy bounds). Same geometry
    as the reference's slippy-bbox + turf.bboxPolygon chain
    (SlippyMaps.ts:52-57); our own deterministic formatting."""
    import math

    n = 2**zoom
    west = x / n * 360.0 - 180.0
    east = (x + 1) / n * 360.0 - 180.0

    def lat_of(yy: int) -> float:
        return math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * yy / n))))

    north = lat_of(y)
    south = lat_of(y + 1)
    pts = [(west, south), (east, south), (east, north), (west, north), (west, south)]
    coords = ", ".join(f"{a:.6f} {b:.6f}" for a, b in pts)
    return f"POLYGON (({coords}))"


def wkt_coords(value: str) -> list[tuple[float, float]]:
    """Extract (lon, lat) pairs from a WKT literal; strips a leading
    '<CRS>' prefix (SlippyMaps.ts:66-71)."""
    v = value.strip()
    if v.startswith("<"):
        v = v[v.index(">") + 1 :].strip()
    pairs = re.findall(r"(-?[\d.]+)\s+(-?[\d.]+)", v)
    return [(float(a), float(b)) for a, b in pairs]


class GeospatialOracle(_OracleBase):
    """Slippy-tile quadtree pager (GeospatialBucketizer.ts:58-114,
    SlippyMaps.ts). Coordinates are parseInt-truncated to integer degrees
    (SlippyMaps.ts:24-25 — the deliberate quirk, preserved). Values that are
    not WKT raise → fallback (SlippyMaps.ts:44-49)."""

    def __init__(self, page_size: int = 50, root: str = "root", zoom: int = 4):
        super().__init__(page_size=page_size, root=root)
        self.zoom = zoom
        self.tiles: dict[str, list[int]] = {}  # tile path -> [page, counter]
        self._controls(self.root, create=True)

    def _create_buckets(self, values, new_relations, immutables):
        buckets: list[str] = []
        for value in values:
            if value.startswith("ERR:") or not wkt_coords(value):
                # stand-in for "datatype not wkt" → createBuckets throws
                raise ValueError("geospatial datatype not supported")
            # distinct tiles in first-seen order (tilesMap, SlippyMaps.ts:20-37)
            tiles: list[tuple[int, int]] = []
            for lon, lat in wkt_coords(value):
                t = (_tile_x(int(lon), self.zoom), _tile_y(int(lat), self.zoom))
                if t not in tiles:
                    tiles.append(t)
            for x, y in tiles:
                leaf = f"{self.zoom}/{x}/{y}"
                column = f"{self.zoom}/{x}"
                bbox = tile_bbox_wkt(x, y, self.zoom)
                if leaf in self.tiles:
                    meta = self.tiles[leaf]
                    if meta[1] == self.page_size:
                        meta[0] += 1
                        meta[1] = 0
                        rel = Relation(
                            column, REL_GEO, f"{leaf}-{meta[0]}", (bbox,)
                        )
                        new_relations.append(rel)
                        self._add_control(column, rel)
                else:
                    meta = [0, 0]
                    self.tiles[leaf] = meta
                    rel = Relation(column, REL_GEO, f"{leaf}-0", (bbox,))
                    new_relations.append(rel)
                    self._add_control(column, rel)
                    # root → column once, with the FIRST tile's bbox (later
                    # tiles merge polygons in-place without re-emitting,
                    # GeospatialBucketizer.ts:82-104)
                    root_controls = self._controls(self.root, create=True)
                    if all(r.to_bucket != column for r in root_controls):
                        root_rel = Relation(self.root, REL_GEO, column, (bbox,))
                        new_relations.append(root_rel)
                        self._add_control(self.root, root_rel)
                buckets.append(f"{leaf}-{meta[0]}")
                meta[1] += 1
        return buckets
