from .vector import cosine_sim, dot, l2_dist, norm2, sq_l2_dist  # noqa: F401
