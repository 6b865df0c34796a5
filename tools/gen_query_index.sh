#!/bin/sh
# Regenerate QUERY_INDEX.md (the query -> API -> spec -> oracle table)
# from the live SparkEntry maps. QueryIndexSpec fails `sbt test` when
# the committed file is stale.
cd "$(dirname "$0")/.." && exec sbt -batch 'Test/runMain graft.QueryIndexGen'
