#ifndef RAPIDJSON_SHIM_FILEWRITESTREAM_H
#define RAPIDJSON_SHIM_FILEWRITESTREAM_H
#include <cstdio>

namespace rapidjson {

class FileWriteStream {
public:
    FileWriteStream(FILE *fp, char *buffer, size_t bufferSize) : fp_(fp) {
        (void)buffer; (void)bufferSize;
    }
    void Put(char c) { fputc(c, fp_); }
    void PutN(char c, size_t n) { for (size_t i = 0; i < n; i++) fputc(c, fp_); }
    void Flush() { fflush(fp_); }

private:
    FILE *fp_;
};

} // namespace rapidjson
#endif
