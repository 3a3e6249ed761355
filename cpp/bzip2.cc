#include "bzip2.h"
