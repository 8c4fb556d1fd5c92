"""Pipeline config: the reference's 3-section JSON shape (input/filter/output).

go-logagent configs look like (utils/config.go family — SURVEY.md §3.1):

    {"input":  [{"type": "file", ...}],
     "filter": [{"type": "grok", ...}, {"type": "patch", ...}],
     "output": [{"type": "file", "name": "parsed", "when": {...}}, ...]}

We keep that shape verbatim (plus optional "enrich" and "aggregate"
sections for the pinned broadcast-join and per-sink-counts stages) so
reference-style configs and test fixtures drop in unchanged.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass
class PipelineConfig:
    input: list[dict] = field(default_factory=list)
    filter: list[dict] = field(default_factory=list)
    enrich: list[dict] = field(default_factory=list)
    output: list[dict] = field(default_factory=list)
    aggregate: dict = field(default_factory=lambda: {"bucket": "hour"})
    # write-layout knobs: {"files_per_sink": k} caps the routed write at
    # ~k files per sink (see plans/pipeline.run for the 100 TB file-count
    # math); default unset = shuffle-free dynamic-partition write
    write: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        for section, entries in (("input", self.input), ("filter", self.filter)):
            for e in entries:
                if "type" not in e:
                    raise ValueError(f"{section} entry missing 'type': {e}")
        names = [o.get("name") for o in self.output]
        if any(n is None for n in names):
            raise ValueError("every output needs a 'name'")
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate output names: {names}")

    @classmethod
    def from_dict(cls, d: dict) -> "PipelineConfig":
        known = {"input", "filter", "enrich", "output", "aggregate", "write"}
        unknown = set(d) - known
        if unknown:
            raise ValueError(f"unknown config sections: {sorted(unknown)}")
        return cls(**{k: v for k, v in d.items() if k in known})

    @classmethod
    def load(cls, path: str) -> "PipelineConfig":
        with open(path) as f:
            text = f.read()
        if path.endswith((".yaml", ".yml")):
            import yaml

            return cls.from_dict(yaml.safe_load(text))
        return cls.from_dict(json.loads(text))


def canonical_config(sink_dir: str | None = None) -> PipelineConfig:
    """The flagship pipeline over the transcripts table: grok-parse tool-log
    and apache lines, json-codec fallback, patch a day field, enrich on
    tool+role, route to parsed/errors/raw sinks, hourly per-sink counts."""
    return PipelineConfig.from_dict(
        {
            "input": [{"type": "table", "table": "transcripts"}],
            "filter": [
                {
                    "type": "grok",
                    "source": "text",
                    "match": [
                        r"\[%{TIMESTAMP_ISO8601:log_ts}\] %{LOGLEVEL:level} "
                        r"tool=%{WORD:tool_name} latency_ms=%{INT:latency_ms:int} "
                        r'status=%{WORD:status} msg="%{DATA:msg}"',
                        r"%{IPV4:clientip} - - \[%{HTTPDATE:http_ts}\] "
                        r'"%{WORD:verb} %{URIPATHPARAM:request} HTTP/%{NUMBER:httpversion}" '
                        r"%{NONNEGINT:response:int} %{NONNEGINT:bytes:int}",
                    ],
                    "add_tag": ["parsed"],
                    # (prefilter_rlike is available but not used here: with
                    # start-anchored patterns the regex engine rejects
                    # non-matching rows in ~O(1), so a prefilter only adds
                    # a pass — measured slower. It pays off for UNANCHORED
                    # patterns where rejection scans the whole string.)
                },
                {
                    "type": "json",
                    "source": "text",
                    "schema": "event string, k long",
                    "tag_on_failure": False,
                },
                {
                    "type": "patch",
                    "fields": {"day": "%{+yyyy-MM-dd}", "route_key": "%{role}/%{tool}"},
                },
            ],
            "enrich": [
                {"dim": "tool_catalog", "key": "tool"},
                {"dim": "role_map", "key": "role"},
            ],
            "output": [
                {"name": "parsed", "when": {"tags_include": ["parsed"]}},
                {
                    "name": "errors",
                    "when": {"tags_include": ["parsed"], "field_equals": {"status": "err"}},
                },
                {"name": "raw", "when": {"tags_include": ["_grokparsefailure"]}},
            ],
            "aggregate": {"bucket": "hour"},
        }
    )
