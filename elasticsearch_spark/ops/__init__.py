"""ES query/filter/agg/join operator surface re-expressed as DataFrame
combinators (SURVEY.md §2.2-§2.8). Filters build Column predicates (non-
scoring, Catalyst-pushdown); aggs build groupBy programs; joins use
broadcast/semi/anti joins — the parent/child analogs."""
