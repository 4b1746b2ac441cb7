from .repo_table import generate_repo_table, repo_commits_dim  # noqa: F401
