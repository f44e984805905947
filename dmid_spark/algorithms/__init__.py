from .pagerank import pagerank  # noqa: F401
from .components import connected_components, incremental_components  # noqa: F401
from .lpa import label_propagation  # noqa: F401
from .triangles import triangle_counts, total_triangles, square_counts  # noqa: F401
from .mis import luby_mis, greedy_coloring  # noqa: F401
from .dmid import dmid, rawlpa, DmidParams, DmidResult  # noqa: F401
from .slpa import slpa, slpa_memories, slpa_post_process  # noqa: F401
from .structure import (  # noqa: F401
    kcore,
    ktruss,
    coreness,
    clustering_coefficients,
    degree_assortativity,
    link_prediction,
)
from .hyperball import (  # noqa: F401
    effective_diameter,
    hyperball,
    hyperball_estimates,
    hyperball_harmonic,
)
# NOTE: binding `louvain` (the function) deliberately shadows the submodule
# name in the package namespace — `from dmid_spark.algorithms import louvain`
# must give the callable
from .louvain import louvain, louvain_refine, partition_modularity  # noqa: F401
from .spectral import (  # noqa: F401
    best_sweep_cut,
    eigenvector_centrality,
    hits,
    katz_centrality,
    personalized_pagerank,
    salsa,
    sweep_cut,
)
from .scc import strongly_connected_components  # noqa: F401
from .paths import (  # noqa: F401
    bfs_distances,
    harmonic_centrality,
    embed_walks,
    node2vec_walks,
    neighbor_sample,
    random_walks,
    ranked_adjacency,
    sampled_adjacency,
)
from .paths import betweenness_sample, edge_betweenness_sample  # noqa: F401
from .paths import sssp  # noqa: F401
from .paths import diameter_double_sweep  # noqa: F401
from .dag import topological_levels  # noqa: F401
from .percolation import (  # noqa: F401
    clique_graph_edges,
    kclique_communities,
    triangle_list,
)
from .mst import minimum_spanning_forest  # noqa: F401
from .embedding import spectral_clustering, spectral_embedding  # noqa: F401
from .propagation import (  # noqa: F401
    features_long,
    features_wide,
    label_spreading,
    smooth_features,
    spread_labels,
    truncated_hitting_time,
)
from .matching import coarsen_graph, maximal_matching  # noqa: F401
