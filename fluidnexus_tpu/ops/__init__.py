from fluidnexus_tpu.ops.rasterizer import RasterizerConfig, project_gaussians, rasterize  # noqa: F401
from fluidnexus_tpu.ops.neighbors import radius_graph, radius_query  # noqa: F401
from fluidnexus_tpu.ops.knn import mean_dist_to_knn  # noqa: F401
