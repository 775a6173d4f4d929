#ifndef RAPIDJSON_SHIM_ERROR_EN_H
#define RAPIDJSON_SHIM_ERROR_EN_H
#include "../document.h"
#endif
