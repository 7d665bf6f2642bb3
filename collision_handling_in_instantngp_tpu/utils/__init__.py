from . import (  # noqa: F401
    checkpoint,
    debug,
    histograms,
    logging,
    memory,
    metrics,
    profiling,
    visualize,
)
