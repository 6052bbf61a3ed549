from .sm import SM
from .mosm import MOSM
from .csm import CSM
from .sm_lmc import SM_LMC
from .conv import CONV
from .mohsm import MOHSM
