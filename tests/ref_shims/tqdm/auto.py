from tqdm import tqdm  # noqa: F401  (package __init__ defines the class)
