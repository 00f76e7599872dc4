"""Query model: ranges, regions, and the interchange-JSON query form.

The JSON shape is the engine's interchange contract (see
graft.query.QuerySerDe on the Scala side): a query is either a `keys`
list (exact row-key lookups) or a `regions` list (per-field
min/minInclusive/max/maxInclusive maps), plus optional
`requestedValueFields` projection.
"""

import json
import uuid


class Range:
    """A one-dimensional row-key range. Defaults follow the engine:
    min inclusive, max exclusive."""

    def __init__(self, min=None, min_inclusive=True, max=None, max_inclusive=False):
        if min is None and max is None:
            raise ValueError("at least one of min/max must be specified")
        self.min = min
        self.min_inclusive = bool(min_inclusive)
        self.max = max
        self.max_inclusive = bool(max_inclusive)

    @staticmethod
    def exact_value(value):
        return Range(min=value, min_inclusive=True, max=value, max_inclusive=True)

    def to_dict(self):
        d = {}
        if self.min is not None:
            d["min"] = self.min
            d["minInclusive"] = self.min_inclusive
        if self.max is not None:
            d["max"] = self.max
            d["maxInclusive"] = self.max_inclusive
        return d


class Region:
    """A multidimensional region: row-key field name -> Range."""

    def __init__(self, field_to_range: dict):
        if not field_to_range:
            raise ValueError("must provide at least one field range")
        self.field_to_range = dict(field_to_range)

    @staticmethod
    def exact_value(field, value):
        return Region({field: Range.exact_value(value)})

    def to_dict(self):
        return {f: r.to_dict() for f, r in self.field_to_range.items()}


class Query:
    """An exact-key or range query in the engine's interchange form."""

    def __init__(self, query_id=None, keys=None, regions=None,
                 requested_value_fields=None):
        if (keys is None) == (regions is None):
            raise ValueError("exactly one of keys/regions must be given")
        self.query_id = query_id or str(uuid.uuid4())
        self.keys = keys
        self.regions = regions
        self.requested_value_fields = requested_value_fields

    def to_dict(self):
        d = {"queryId": self.query_id, "type": "Query"}
        if self.keys is not None:
            d["keys"] = list(self.keys)
        if self.regions is not None:
            d["regions"] = [r.to_dict() for r in self.regions]
        if self.requested_value_fields is not None:
            d["requestedValueFields"] = list(self.requested_value_fields)
        return d

    def to_json(self):
        return json.dumps(self.to_dict())
