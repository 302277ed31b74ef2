"""Pipeline assembly: parse → enrich → route → aggregate, with lineage."""
