from .edges import (  # noqa: F401
    canonicalize_edges,
    cooccurrence_edges,
    degrees,
    derive_edges,
    encode_vertices,
    extract_entities,
    symmetrize,
    vertices_of,
    with_content_sha256,
)
from .cc import connected_components  # noqa: F401
from .hyperball import HyperBallResult, hyperball  # noqa: F401
from .centrality import betweenness_from_sources  # noqa: F401
from .kcore import core_numbers, degeneracy, k_core  # noqa: F401
from .incremental import incremental_components  # noqa: F401
from .linkpred import link_prediction_scores  # noqa: F401
from .paths import multi_source_distances  # noqa: F401
from .quality import modularity, modularity_by_community  # noqa: F401
from .pagerank import pagerank  # noqa: F401
from .lpa import label_propagation  # noqa: F401
from .triangles import (  # noqa: F401
    clustering_coefficient,
    transitivity,
    triangle_count,
    triangle_count_sampled,
    triangles_per_vertex,
)
from .rollup import bipartite_group_rollup  # noqa: F401
from .truss import edge_support, k_truss  # noqa: F401
from .walks import (  # noqa: F401
    alias_tables,
    random_walks,
    ranked_adjacency,
    skipgram_pairs,
)
from .skew import (  # noqa: F401
    degree_histogram,
    hub_vertices,
    salted_collect,
    salted_join,
)
