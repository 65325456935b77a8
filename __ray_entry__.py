"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already initialised,
local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01 and compares it against
the matching ``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: events-derived transcripts →
    parse → enrich → route (rule fan-out) → dedup. Returns the routed Dataset."""
    from sts_opentelemetry_collector_ray.pipelines import routed_dataset
    from sts_opentelemetry_collector_ray.sources import derive_transcripts_from_events

    ds = derive_transcripts_from_events("/root/testdata/sf0.001")
    return routed_dataset(ds, dedup=True, enrich_concurrency=2, route_concurrency=None)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from sts_opentelemetry_collector_ray.pipelines.queries import QUERIES
    from sts_opentelemetry_collector_ray.pipelines.queries2 import QUERIES2
    from sts_opentelemetry_collector_ray.pipelines.queries3 import QUERIES3
    from sts_opentelemetry_collector_ray.pipelines.queries4 import QUERIES4
    from sts_opentelemetry_collector_ray.pipelines.queries5 import QUERIES5
    from sts_opentelemetry_collector_ray.pipelines.queries6 import QUERIES6
    from sts_opentelemetry_collector_ray.pipelines.queries7 import QUERIES7
    from sts_opentelemetry_collector_ray.pipelines.queries8 import QUERIES8
    from sts_opentelemetry_collector_ray.pipelines.queries9 import QUERIES9
    from sts_opentelemetry_collector_ray.pipelines.queries10 import QUERIES10
    from sts_opentelemetry_collector_ray.pipelines.queries11 import QUERIES11
    from sts_opentelemetry_collector_ray.pipelines.queries12 import QUERIES12
    from sts_opentelemetry_collector_ray.pipelines.queries13 import QUERIES13
    from sts_opentelemetry_collector_ray.pipelines.queries14 import QUERIES14
    from sts_opentelemetry_collector_ray.pipelines.queries15 import QUERIES15
    from sts_opentelemetry_collector_ray.pipelines.queries16 import QUERIES16
    from sts_opentelemetry_collector_ray.pipelines.queries17 import QUERIES17
    from sts_opentelemetry_collector_ray.pipelines.queries18 import QUERIES18
    from sts_opentelemetry_collector_ray.pipelines.queries19 import QUERIES19
    from sts_opentelemetry_collector_ray.pipelines.queries20 import QUERIES20
    from sts_opentelemetry_collector_ray.pipelines.queries21 import QUERIES21
    from sts_opentelemetry_collector_ray.pipelines.queries22 import QUERIES22
    from sts_opentelemetry_collector_ray.pipelines.queries23 import QUERIES23
    from sts_opentelemetry_collector_ray.pipelines.queries24 import QUERIES24
    from sts_opentelemetry_collector_ray.pipelines.queries25 import QUERIES25
    from sts_opentelemetry_collector_ray.pipelines.queries26 import QUERIES26
    from sts_opentelemetry_collector_ray.pipelines.queries27 import QUERIES27
    from sts_opentelemetry_collector_ray.pipelines.queries28 import QUERIES28
    from sts_opentelemetry_collector_ray.pipelines.queries29 import QUERIES29
    from sts_opentelemetry_collector_ray.pipelines.queries30 import QUERIES30
    from sts_opentelemetry_collector_ray.pipelines.queries31 import QUERIES31
    from sts_opentelemetry_collector_ray.pipelines.queries32 import QUERIES32
    from sts_opentelemetry_collector_ray.pipelines.queries33 import QUERIES33
    from sts_opentelemetry_collector_ray.pipelines.queries34 import QUERIES34
    from sts_opentelemetry_collector_ray.pipelines.queries35 import QUERIES35
    from sts_opentelemetry_collector_ray.pipelines.queries36 import QUERIES36
    from sts_opentelemetry_collector_ray.pipelines.queries37 import QUERIES37
    from sts_opentelemetry_collector_ray.pipelines.queries38 import QUERIES38
    from sts_opentelemetry_collector_ray.pipelines.queries39 import QUERIES39
    from sts_opentelemetry_collector_ray.pipelines.queries40 import QUERIES40
    from sts_opentelemetry_collector_ray.pipelines.queries41 import QUERIES41
    from sts_opentelemetry_collector_ray.pipelines.queries42 import QUERIES42
    from sts_opentelemetry_collector_ray.pipelines.queries43 import QUERIES43
    from sts_opentelemetry_collector_ray.pipelines.queries44 import QUERIES44
    from sts_opentelemetry_collector_ray.pipelines.queries45 import QUERIES45
    from sts_opentelemetry_collector_ray.pipelines.queries46 import QUERIES46
    from sts_opentelemetry_collector_ray.pipelines.queries47 import QUERIES47
    from sts_opentelemetry_collector_ray.pipelines.queries48 import QUERIES48
    from sts_opentelemetry_collector_ray.pipelines.queries49 import QUERIES49
    from sts_opentelemetry_collector_ray.pipelines.queries50 import QUERIES50
    from sts_opentelemetry_collector_ray.pipelines.queries51 import QUERIES51
    from sts_opentelemetry_collector_ray.pipelines.queries52 import QUERIES52
    from sts_opentelemetry_collector_ray.pipelines.queries53 import QUERIES53
    from sts_opentelemetry_collector_ray.pipelines.queries54 import QUERIES54
    from sts_opentelemetry_collector_ray.pipelines.queries55 import QUERIES55
    from sts_opentelemetry_collector_ray.pipelines.queries56 import QUERIES56
    from sts_opentelemetry_collector_ray.pipelines.queries57 import QUERIES57
    from sts_opentelemetry_collector_ray.pipelines.queries58 import QUERIES58
    from sts_opentelemetry_collector_ray.pipelines.queries59 import QUERIES59
    from sts_opentelemetry_collector_ray.pipelines.queries60 import QUERIES60
    from sts_opentelemetry_collector_ray.pipelines.queries61 import QUERIES61
    from sts_opentelemetry_collector_ray.pipelines.queries62 import QUERIES62
    from sts_opentelemetry_collector_ray.pipelines.queries63 import QUERIES63
    from sts_opentelemetry_collector_ray.pipelines.queries64 import QUERIES64
    from sts_opentelemetry_collector_ray.pipelines.queries65 import QUERIES65
    from sts_opentelemetry_collector_ray.pipelines.queries66 import QUERIES66
    from sts_opentelemetry_collector_ray.pipelines.queries67 import QUERIES67
    from sts_opentelemetry_collector_ray.pipelines.queries68 import QUERIES68
    from sts_opentelemetry_collector_ray.pipelines.queries69 import QUERIES69
    from sts_opentelemetry_collector_ray.pipelines.queries70 import QUERIES70
    from sts_opentelemetry_collector_ray.pipelines.queries71 import QUERIES71
    from sts_opentelemetry_collector_ray.pipelines.queries72 import QUERIES72
    from sts_opentelemetry_collector_ray.pipelines.queries73 import QUERIES73
    from sts_opentelemetry_collector_ray.pipelines.queries74 import QUERIES74
    from sts_opentelemetry_collector_ray.pipelines.queries75 import QUERIES75
    from sts_opentelemetry_collector_ray.pipelines.queries76 import QUERIES76
    from sts_opentelemetry_collector_ray.pipelines.queries77 import QUERIES77
    from sts_opentelemetry_collector_ray.pipelines.queries78 import QUERIES78
    from sts_opentelemetry_collector_ray.pipelines.queries79 import QUERIES79
    from sts_opentelemetry_collector_ray.pipelines.queries80 import QUERIES80
    from sts_opentelemetry_collector_ray.pipelines.queries81 import QUERIES81
    from sts_opentelemetry_collector_ray.pipelines.queries82 import QUERIES82
    from sts_opentelemetry_collector_ray.pipelines.queries83 import QUERIES83
    from sts_opentelemetry_collector_ray.pipelines.queries84 import QUERIES84
    from sts_opentelemetry_collector_ray.pipelines.queries85 import QUERIES85
    from sts_opentelemetry_collector_ray.pipelines.queries86 import QUERIES86
    from sts_opentelemetry_collector_ray.pipelines.queries87 import QUERIES87
    from sts_opentelemetry_collector_ray.pipelines.queries88 import QUERIES88
    from sts_opentelemetry_collector_ray.pipelines.queries89 import QUERIES89
    from sts_opentelemetry_collector_ray.pipelines.queries90 import QUERIES90
    from sts_opentelemetry_collector_ray.pipelines.queries91 import QUERIES91
    from sts_opentelemetry_collector_ray.pipelines.queries92 import QUERIES92
    from sts_opentelemetry_collector_ray.pipelines.queries93 import QUERIES93
    from sts_opentelemetry_collector_ray.pipelines.queries94 import QUERIES94
    from sts_opentelemetry_collector_ray.pipelines.queries95 import QUERIES95
    from sts_opentelemetry_collector_ray.pipelines.queries96 import QUERIES96
    from sts_opentelemetry_collector_ray.pipelines.queries97 import QUERIES97
    from sts_opentelemetry_collector_ray.pipelines.queries98 import QUERIES98
    from sts_opentelemetry_collector_ray.pipelines.queries99 import QUERIES99
    from sts_opentelemetry_collector_ray.pipelines.queries100 import QUERIES100
    from sts_opentelemetry_collector_ray.pipelines.queries101 import QUERIES101
    from sts_opentelemetry_collector_ray.pipelines.queries102 import QUERIES102
    from sts_opentelemetry_collector_ray.pipelines.queries103 import QUERIES103
    from sts_opentelemetry_collector_ray.pipelines.queries104 import QUERIES104
    from sts_opentelemetry_collector_ray.pipelines.queries105 import QUERIES105
    from sts_opentelemetry_collector_ray.pipelines.queries106 import QUERIES106
    from sts_opentelemetry_collector_ray.pipelines.queries107 import QUERIES107
    from sts_opentelemetry_collector_ray.pipelines.queries108 import QUERIES108
    from sts_opentelemetry_collector_ray.pipelines.queries109 import QUERIES109
    from sts_opentelemetry_collector_ray.pipelines.queries110 import QUERIES110
    from sts_opentelemetry_collector_ray.pipelines.queries111 import QUERIES111
    from sts_opentelemetry_collector_ray.pipelines.queries112 import QUERIES112
    from sts_opentelemetry_collector_ray.pipelines.queries113 import QUERIES113
    from sts_opentelemetry_collector_ray.pipelines.queries114 import QUERIES114
    from sts_opentelemetry_collector_ray.pipelines.queries115 import QUERIES115
    from sts_opentelemetry_collector_ray.pipelines.queries116 import QUERIES116
    from sts_opentelemetry_collector_ray.pipelines.queries117 import QUERIES117
    from sts_opentelemetry_collector_ray.pipelines.queries118 import QUERIES118
    from sts_opentelemetry_collector_ray.pipelines.queries119 import QUERIES119
    from sts_opentelemetry_collector_ray.pipelines.queries120 import QUERIES120
    from sts_opentelemetry_collector_ray.pipelines.queries121 import QUERIES121
    from sts_opentelemetry_collector_ray.pipelines.queries122 import QUERIES122
    from sts_opentelemetry_collector_ray.pipelines.queries123 import QUERIES123
    from sts_opentelemetry_collector_ray.pipelines.queries124 import QUERIES124
    from sts_opentelemetry_collector_ray.pipelines.queries125 import QUERIES125
    from sts_opentelemetry_collector_ray.pipelines.queries126 import QUERIES126
    from sts_opentelemetry_collector_ray.pipelines.queries127 import QUERIES127
    from sts_opentelemetry_collector_ray.pipelines.queries128 import QUERIES128
    from sts_opentelemetry_collector_ray.pipelines.queries129 import QUERIES129
    from sts_opentelemetry_collector_ray.pipelines.queries130 import QUERIES130
    from sts_opentelemetry_collector_ray.pipelines.queries131 import QUERIES131
    from sts_opentelemetry_collector_ray.pipelines.queries132 import QUERIES132
    from sts_opentelemetry_collector_ray.pipelines.queries133 import QUERIES133
    from sts_opentelemetry_collector_ray.pipelines.queries134 import QUERIES134
    from sts_opentelemetry_collector_ray.pipelines.queries135 import QUERIES135
    from sts_opentelemetry_collector_ray.pipelines.queries136 import QUERIES136
    from sts_opentelemetry_collector_ray.pipelines.queries137 import QUERIES137
    from sts_opentelemetry_collector_ray.pipelines.queries138 import QUERIES138
    from sts_opentelemetry_collector_ray.pipelines.queries139 import QUERIES139
    from sts_opentelemetry_collector_ray.pipelines.queries140 import QUERIES140
    from sts_opentelemetry_collector_ray.pipelines.queries141 import QUERIES141
    from sts_opentelemetry_collector_ray.pipelines.queries142 import QUERIES142
    from sts_opentelemetry_collector_ray.pipelines.queries143 import QUERIES143
    from sts_opentelemetry_collector_ray.pipelines.queries144 import QUERIES144
    from sts_opentelemetry_collector_ray.pipelines.queries145 import QUERIES145
    from sts_opentelemetry_collector_ray.pipelines.queries146 import QUERIES146
    from sts_opentelemetry_collector_ray.pipelines.queries147 import QUERIES147
    from sts_opentelemetry_collector_ray.pipelines.queries148 import QUERIES148
    from sts_opentelemetry_collector_ray.pipelines.queries149 import QUERIES149
    from sts_opentelemetry_collector_ray.pipelines.queries150 import QUERIES150

    return {**QUERIES, **QUERIES2, **QUERIES3, **QUERIES4, **QUERIES5, **QUERIES6, **QUERIES7, **QUERIES8, **QUERIES9, **QUERIES10, **QUERIES11, **QUERIES12, **QUERIES13, **QUERIES14, **QUERIES15, **QUERIES16, **QUERIES17, **QUERIES18, **QUERIES19, **QUERIES20, **QUERIES21, **QUERIES22, **QUERIES23, **QUERIES24, **QUERIES25, **QUERIES26, **QUERIES27, **QUERIES28, **QUERIES29, **QUERIES30, **QUERIES31, **QUERIES32, **QUERIES33, **QUERIES34, **QUERIES35, **QUERIES36, **QUERIES37, **QUERIES38, **QUERIES39, **QUERIES40, **QUERIES41, **QUERIES42, **QUERIES43, **QUERIES44, **QUERIES45, **QUERIES46, **QUERIES47, **QUERIES48, **QUERIES49, **QUERIES50, **QUERIES51, **QUERIES52, **QUERIES53, **QUERIES54, **QUERIES55, **QUERIES56, **QUERIES57, **QUERIES58, **QUERIES59, **QUERIES60, **QUERIES61, **QUERIES62, **QUERIES63, **QUERIES64, **QUERIES65, **QUERIES66, **QUERIES67, **QUERIES68, **QUERIES69, **QUERIES70, **QUERIES71, **QUERIES72, **QUERIES73, **QUERIES74, **QUERIES75, **QUERIES76, **QUERIES77, **QUERIES78, **QUERIES79, **QUERIES80, **QUERIES81, **QUERIES82, **QUERIES83, **QUERIES84, **QUERIES85, **QUERIES86, **QUERIES87, **QUERIES88, **QUERIES89, **QUERIES90, **QUERIES91, **QUERIES92, **QUERIES93, **QUERIES94, **QUERIES95, **QUERIES96, **QUERIES97, **QUERIES98, **QUERIES99, **QUERIES100, **QUERIES101, **QUERIES102, **QUERIES103, **QUERIES104, **QUERIES105, **QUERIES106, **QUERIES107, **QUERIES108, **QUERIES109, **QUERIES110, **QUERIES111, **QUERIES112, **QUERIES113, **QUERIES114, **QUERIES115, **QUERIES116, **QUERIES117, **QUERIES118, **QUERIES119, **QUERIES120, **QUERIES121, **QUERIES122, **QUERIES123, **QUERIES124, **QUERIES125, **QUERIES126, **QUERIES127, **QUERIES128, **QUERIES129, **QUERIES130, **QUERIES131, **QUERIES132, **QUERIES133, **QUERIES134, **QUERIES135, **QUERIES136, **QUERIES137, **QUERIES138, **QUERIES139, **QUERIES140, **QUERIES141, **QUERIES142, **QUERIES143, **QUERIES144, **QUERIES145, **QUERIES146, **QUERIES147, **QUERIES148, **QUERIES149, **QUERIES150}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names and types). Queries
    absent here (LSH/heuristic operators) get the driver's rows-only check; their
    brute-force oracles live in tests/."""
    from sts_opentelemetry_collector_ray.pipelines.queries import ORACLES
    from sts_opentelemetry_collector_ray.pipelines.queries2 import ORACLES2
    from sts_opentelemetry_collector_ray.pipelines.queries3 import ORACLES3, dynamic_oracles
    from sts_opentelemetry_collector_ray.pipelines.queries4 import ORACLES4, dynamic_oracles4
    from sts_opentelemetry_collector_ray.pipelines.queries5 import ORACLES5
    from sts_opentelemetry_collector_ray.pipelines.queries6 import ORACLES6
    from sts_opentelemetry_collector_ray.pipelines.queries7 import ORACLES7
    from sts_opentelemetry_collector_ray.pipelines.queries8 import ORACLES8
    from sts_opentelemetry_collector_ray.pipelines.queries9 import ORACLES9
    from sts_opentelemetry_collector_ray.pipelines.queries10 import ORACLES10
    from sts_opentelemetry_collector_ray.pipelines.queries11 import ORACLES11
    from sts_opentelemetry_collector_ray.pipelines.queries12 import ORACLES12
    from sts_opentelemetry_collector_ray.pipelines.queries13 import ORACLES13
    from sts_opentelemetry_collector_ray.pipelines.queries14 import ORACLES14
    from sts_opentelemetry_collector_ray.pipelines.queries15 import ORACLES15
    from sts_opentelemetry_collector_ray.pipelines.queries16 import ORACLES16
    from sts_opentelemetry_collector_ray.pipelines.queries17 import ORACLES17
    from sts_opentelemetry_collector_ray.pipelines.queries18 import ORACLES18
    from sts_opentelemetry_collector_ray.pipelines.queries19 import ORACLES19
    from sts_opentelemetry_collector_ray.pipelines.queries20 import ORACLES20
    from sts_opentelemetry_collector_ray.pipelines.queries21 import ORACLES21
    from sts_opentelemetry_collector_ray.pipelines.queries22 import ORACLES22
    from sts_opentelemetry_collector_ray.pipelines.queries23 import ORACLES23
    from sts_opentelemetry_collector_ray.pipelines.queries24 import ORACLES24
    from sts_opentelemetry_collector_ray.pipelines.queries25 import ORACLES25
    from sts_opentelemetry_collector_ray.pipelines.queries26 import ORACLES26
    from sts_opentelemetry_collector_ray.pipelines.queries27 import ORACLES27
    from sts_opentelemetry_collector_ray.pipelines.queries28 import ORACLES28
    from sts_opentelemetry_collector_ray.pipelines.queries29 import ORACLES29
    from sts_opentelemetry_collector_ray.pipelines.queries30 import ORACLES30
    from sts_opentelemetry_collector_ray.pipelines.queries31 import ORACLES31
    from sts_opentelemetry_collector_ray.pipelines.queries32 import ORACLES32
    from sts_opentelemetry_collector_ray.pipelines.queries33 import ORACLES33
    from sts_opentelemetry_collector_ray.pipelines.queries34 import ORACLES34
    from sts_opentelemetry_collector_ray.pipelines.queries35 import ORACLES35
    from sts_opentelemetry_collector_ray.pipelines.queries36 import ORACLES36
    from sts_opentelemetry_collector_ray.pipelines.queries37 import ORACLES37
    from sts_opentelemetry_collector_ray.pipelines.queries38 import ORACLES38
    from sts_opentelemetry_collector_ray.pipelines.queries39 import ORACLES39
    from sts_opentelemetry_collector_ray.pipelines.queries40 import ORACLES40
    from sts_opentelemetry_collector_ray.pipelines.queries41 import ORACLES41
    from sts_opentelemetry_collector_ray.pipelines.queries42 import ORACLES42
    from sts_opentelemetry_collector_ray.pipelines.queries43 import ORACLES43
    from sts_opentelemetry_collector_ray.pipelines.queries44 import ORACLES44
    from sts_opentelemetry_collector_ray.pipelines.queries45 import ORACLES45
    from sts_opentelemetry_collector_ray.pipelines.queries46 import ORACLES46
    from sts_opentelemetry_collector_ray.pipelines.queries47 import ORACLES47
    from sts_opentelemetry_collector_ray.pipelines.queries48 import ORACLES48
    from sts_opentelemetry_collector_ray.pipelines.queries49 import ORACLES49
    from sts_opentelemetry_collector_ray.pipelines.queries50 import ORACLES50
    from sts_opentelemetry_collector_ray.pipelines.queries51 import ORACLES51
    from sts_opentelemetry_collector_ray.pipelines.queries52 import ORACLES52
    from sts_opentelemetry_collector_ray.pipelines.queries53 import ORACLES53
    from sts_opentelemetry_collector_ray.pipelines.queries54 import ORACLES54
    from sts_opentelemetry_collector_ray.pipelines.queries55 import ORACLES55
    from sts_opentelemetry_collector_ray.pipelines.queries56 import ORACLES56
    from sts_opentelemetry_collector_ray.pipelines.queries57 import ORACLES57
    from sts_opentelemetry_collector_ray.pipelines.queries58 import ORACLES58
    from sts_opentelemetry_collector_ray.pipelines.queries59 import ORACLES59
    from sts_opentelemetry_collector_ray.pipelines.queries60 import ORACLES60
    from sts_opentelemetry_collector_ray.pipelines.queries61 import ORACLES61
    from sts_opentelemetry_collector_ray.pipelines.queries62 import ORACLES62
    from sts_opentelemetry_collector_ray.pipelines.queries63 import ORACLES63
    from sts_opentelemetry_collector_ray.pipelines.queries64 import ORACLES64
    from sts_opentelemetry_collector_ray.pipelines.queries65 import ORACLES65
    from sts_opentelemetry_collector_ray.pipelines.queries66 import ORACLES66
    from sts_opentelemetry_collector_ray.pipelines.queries67 import ORACLES67
    from sts_opentelemetry_collector_ray.pipelines.queries68 import ORACLES68
    from sts_opentelemetry_collector_ray.pipelines.queries69 import ORACLES69
    from sts_opentelemetry_collector_ray.pipelines.queries70 import ORACLES70
    from sts_opentelemetry_collector_ray.pipelines.queries71 import ORACLES71
    from sts_opentelemetry_collector_ray.pipelines.queries72 import ORACLES72
    from sts_opentelemetry_collector_ray.pipelines.queries73 import ORACLES73
    from sts_opentelemetry_collector_ray.pipelines.queries74 import ORACLES74
    from sts_opentelemetry_collector_ray.pipelines.queries75 import ORACLES75
    from sts_opentelemetry_collector_ray.pipelines.queries76 import ORACLES76
    from sts_opentelemetry_collector_ray.pipelines.queries77 import ORACLES77
    from sts_opentelemetry_collector_ray.pipelines.queries78 import ORACLES78
    from sts_opentelemetry_collector_ray.pipelines.queries79 import ORACLES79
    from sts_opentelemetry_collector_ray.pipelines.queries80 import ORACLES80
    from sts_opentelemetry_collector_ray.pipelines.queries81 import ORACLES81
    from sts_opentelemetry_collector_ray.pipelines.queries82 import ORACLES82
    from sts_opentelemetry_collector_ray.pipelines.queries83 import ORACLES83
    from sts_opentelemetry_collector_ray.pipelines.queries84 import ORACLES84
    from sts_opentelemetry_collector_ray.pipelines.queries85 import ORACLES85
    from sts_opentelemetry_collector_ray.pipelines.queries86 import ORACLES86
    from sts_opentelemetry_collector_ray.pipelines.queries87 import ORACLES87
    from sts_opentelemetry_collector_ray.pipelines.queries88 import ORACLES88
    from sts_opentelemetry_collector_ray.pipelines.queries89 import ORACLES89
    from sts_opentelemetry_collector_ray.pipelines.queries90 import ORACLES90
    from sts_opentelemetry_collector_ray.pipelines.queries91 import ORACLES91
    from sts_opentelemetry_collector_ray.pipelines.queries92 import ORACLES92
    from sts_opentelemetry_collector_ray.pipelines.queries93 import ORACLES93
    from sts_opentelemetry_collector_ray.pipelines.queries94 import ORACLES94
    from sts_opentelemetry_collector_ray.pipelines.queries95 import ORACLES95
    from sts_opentelemetry_collector_ray.pipelines.queries96 import ORACLES96
    from sts_opentelemetry_collector_ray.pipelines.queries97 import ORACLES97
    from sts_opentelemetry_collector_ray.pipelines.queries98 import ORACLES98
    from sts_opentelemetry_collector_ray.pipelines.queries99 import ORACLES99
    from sts_opentelemetry_collector_ray.pipelines.queries100 import ORACLES100
    from sts_opentelemetry_collector_ray.pipelines.queries101 import ORACLES101
    from sts_opentelemetry_collector_ray.pipelines.queries102 import ORACLES102
    from sts_opentelemetry_collector_ray.pipelines.queries103 import ORACLES103
    from sts_opentelemetry_collector_ray.pipelines.queries104 import ORACLES104
    from sts_opentelemetry_collector_ray.pipelines.queries105 import ORACLES105
    from sts_opentelemetry_collector_ray.pipelines.queries106 import ORACLES106
    from sts_opentelemetry_collector_ray.pipelines.queries107 import ORACLES107
    from sts_opentelemetry_collector_ray.pipelines.queries108 import ORACLES108
    from sts_opentelemetry_collector_ray.pipelines.queries109 import ORACLES109
    from sts_opentelemetry_collector_ray.pipelines.queries110 import ORACLES110
    from sts_opentelemetry_collector_ray.pipelines.queries111 import ORACLES111
    from sts_opentelemetry_collector_ray.pipelines.queries112 import ORACLES112
    from sts_opentelemetry_collector_ray.pipelines.queries113 import ORACLES113
    from sts_opentelemetry_collector_ray.pipelines.queries114 import ORACLES114
    from sts_opentelemetry_collector_ray.pipelines.queries115 import ORACLES115
    from sts_opentelemetry_collector_ray.pipelines.queries116 import ORACLES116
    from sts_opentelemetry_collector_ray.pipelines.queries117 import ORACLES117
    from sts_opentelemetry_collector_ray.pipelines.queries118 import ORACLES118
    from sts_opentelemetry_collector_ray.pipelines.queries119 import ORACLES119
    from sts_opentelemetry_collector_ray.pipelines.queries120 import ORACLES120
    from sts_opentelemetry_collector_ray.pipelines.queries121 import ORACLES121
    from sts_opentelemetry_collector_ray.pipelines.queries122 import ORACLES122
    from sts_opentelemetry_collector_ray.pipelines.queries123 import ORACLES123
    from sts_opentelemetry_collector_ray.pipelines.queries124 import ORACLES124
    from sts_opentelemetry_collector_ray.pipelines.queries125 import ORACLES125
    from sts_opentelemetry_collector_ray.pipelines.queries126 import ORACLES126
    from sts_opentelemetry_collector_ray.pipelines.queries127 import ORACLES127
    from sts_opentelemetry_collector_ray.pipelines.queries128 import ORACLES128
    from sts_opentelemetry_collector_ray.pipelines.queries129 import ORACLES129
    from sts_opentelemetry_collector_ray.pipelines.queries130 import ORACLES130
    from sts_opentelemetry_collector_ray.pipelines.queries131 import ORACLES131
    from sts_opentelemetry_collector_ray.pipelines.queries132 import ORACLES132
    from sts_opentelemetry_collector_ray.pipelines.queries133 import ORACLES133
    from sts_opentelemetry_collector_ray.pipelines.queries134 import ORACLES134
    from sts_opentelemetry_collector_ray.pipelines.queries135 import ORACLES135
    from sts_opentelemetry_collector_ray.pipelines.queries136 import ORACLES136
    from sts_opentelemetry_collector_ray.pipelines.queries137 import ORACLES137
    from sts_opentelemetry_collector_ray.pipelines.queries138 import ORACLES138
    from sts_opentelemetry_collector_ray.pipelines.queries139 import ORACLES139
    from sts_opentelemetry_collector_ray.pipelines.queries140 import ORACLES140
    from sts_opentelemetry_collector_ray.pipelines.queries141 import ORACLES141
    from sts_opentelemetry_collector_ray.pipelines.queries142 import ORACLES142
    from sts_opentelemetry_collector_ray.pipelines.queries143 import ORACLES143
    from sts_opentelemetry_collector_ray.pipelines.queries144 import ORACLES144
    from sts_opentelemetry_collector_ray.pipelines.queries145 import ORACLES145
    from sts_opentelemetry_collector_ray.pipelines.queries146 import ORACLES146
    from sts_opentelemetry_collector_ray.pipelines.queries147 import ORACLES147
    from sts_opentelemetry_collector_ray.pipelines.queries148 import ORACLES148
    from sts_opentelemetry_collector_ray.pipelines.queries149 import ORACLES149
    from sts_opentelemetry_collector_ray.pipelines.queries150 import ORACLES150

    return {**ORACLES, **ORACLES2, **ORACLES3, **ORACLES4, **ORACLES5, **ORACLES6, **ORACLES7, **ORACLES8, **ORACLES9, **ORACLES10, **ORACLES11, **ORACLES12, **ORACLES13, **ORACLES14, **ORACLES15, **ORACLES16, **ORACLES17, **ORACLES18, **ORACLES19, **ORACLES20, **ORACLES21, **ORACLES22, **ORACLES23, **ORACLES24, **ORACLES25, **ORACLES26, **ORACLES27, **ORACLES28, **ORACLES29, **ORACLES30, **ORACLES31, **ORACLES32, **ORACLES33, **ORACLES34, **ORACLES35, **ORACLES36, **ORACLES37, **ORACLES38, **ORACLES39, **ORACLES40, **ORACLES41, **ORACLES42, **ORACLES43, **ORACLES44, **ORACLES45, **ORACLES46, **ORACLES47, **ORACLES48, **ORACLES49, **ORACLES50, **ORACLES51, **ORACLES52, **ORACLES53, **ORACLES54, **ORACLES55, **ORACLES56, **ORACLES57, **ORACLES58, **ORACLES59, **ORACLES60, **ORACLES61, **ORACLES62, **ORACLES63, **ORACLES64, **ORACLES65, **ORACLES66, **ORACLES67, **ORACLES68, **ORACLES69, **ORACLES70, **ORACLES71, **ORACLES72, **ORACLES73, **ORACLES74, **ORACLES75, **ORACLES76, **ORACLES77, **ORACLES78, **ORACLES79, **ORACLES80, **ORACLES81, **ORACLES82, **ORACLES83, **ORACLES84, **ORACLES85, **ORACLES86, **ORACLES87, **ORACLES88, **ORACLES89, **ORACLES90, **ORACLES91, **ORACLES92, **ORACLES93, **ORACLES94, **ORACLES95, **ORACLES96, **ORACLES97, **ORACLES98, **ORACLES99, **ORACLES100, **ORACLES101, **ORACLES102, **ORACLES103, **ORACLES104, **ORACLES105, **ORACLES106, **ORACLES107, **ORACLES108, **ORACLES109, **ORACLES110, **ORACLES111, **ORACLES112, **ORACLES113, **ORACLES114, **ORACLES115, **ORACLES116, **ORACLES117, **ORACLES118, **ORACLES119, **ORACLES120, **ORACLES121, **ORACLES122, **ORACLES123, **ORACLES124, **ORACLES125, **ORACLES126, **ORACLES127, **ORACLES128, **ORACLES129, **ORACLES130, **ORACLES131, **ORACLES132, **ORACLES133, **ORACLES134, **ORACLES135, **ORACLES136, **ORACLES137, **ORACLES138, **ORACLES139, **ORACLES140, **ORACLES141, **ORACLES142, **ORACLES143, **ORACLES144, **ORACLES145, **ORACLES146, **ORACLES147, **ORACLES148, **ORACLES149, **ORACLES150, **dynamic_oracles(), **dynamic_oracles4()}
