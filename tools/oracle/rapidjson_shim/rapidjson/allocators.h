#ifndef RAPIDJSON_SHIM_ALLOCATORS_H
#define RAPIDJSON_SHIM_ALLOCATORS_H
#include "document.h"
#endif
