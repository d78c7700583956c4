"""flashmd_tpu — a TPU-native molecular-dynamics framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference FlashMD (UNITES-Lab/flash-molecular-dynamics): neural-network
(CGSchNet) + classical-prior force fields driving Langevin / NVE /
overdamped / parallel-tempering integrators over large batches of
independent molecules, engineered for inference-time MD throughput on TPU.
"""

__version__ = "0.1.0"

from .data.keys import (  # noqa: F401
    ATOM_TYPE_KEY,
    ENERGY_KEY,
    FORCE_KEY,
    MASS_KEY,
    POSITIONS_KEY,
    VELOCITY_KEY,
)
from .data.system import (  # noqa: F401
    Configuration,
    System,
    TermList,
    collate,
    make_term_list,
    validate_term_list,
)
from .models.cutoff import (  # noqa: F401
    CosineCutoff,
    IdentityCutoff,
    ShiftedCosineCutoff,
)
from .models.forcefield import (  # noqa: F401
    ForceField,
    compute_energy_forces,
    total_energy,
)
from .models.radial_basis import (  # noqa: F401
    GaussianBasisConfig,
    gaussian_basis_apply,
    init_gaussian_basis,
)
from .models.schnet import SchNetConfig, init_schnet, schnet_energy  # noqa: F401
from .prior.priors import Prior, prior_energy  # noqa: F401
