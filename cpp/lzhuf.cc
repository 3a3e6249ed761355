#include "lzhuf.h"
